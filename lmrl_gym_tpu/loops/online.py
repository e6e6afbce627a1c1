"""Round-based online loop: rollout → dataset → train → refresh policy.

Shape of the reference's PPO `train_loop` (algorithms/ppo/train.py:138-478),
which also serves online ILQL (chess/ilql/train_online_ilql.py:415-419) and
online filtered BC (algorithms/online_filtered_bc/train.py:167-259):

per round r:
  dataset = load_dataset(train_state)     # fresh rollouts (or offline slice)
  if dataset is None: skip round          # filtered-BC empty-filter case
  for epoch, batches: train_state = step(...)
  periodic eval/save; policy params refresh happens implicitly because
  load_dataset closes over the live train_state.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np

from lmrl_gym_tpu.algos.data import ArrayDataset
from lmrl_gym_tpu.core.logs import combine_logs, label_logs, log, pull_logs
from lmrl_gym_tpu.loops.checkpoints import CheckpointManager, LoopState

# load_dataset(train_state, round) -> ArrayDataset | None
DatasetLoader = Callable[[Any, int], Optional[ArrayDataset]]
StepFn = Callable[[Any, Any, jax.Array], Tuple[Any, Any, Any]]
Evaluator = Callable[[Any], Tuple[float, Any]]


@dataclass
class OnlineLoopConfig:
    n_rounds: int = 10
    epochs_per_round: int = 1
    train_bsize: int = 32
    log_every: Optional[int] = 64
    eval_every_rounds: Optional[int] = 1
    save_every_rounds: Optional[int] = None
    save_at_end: bool = True
    save_best: bool = True
    max_checkpoints: Optional[int] = 2
    save_dir: Optional[str] = None
    save_train_state: bool = False
    use_wandb: bool = False
    seed: int = 0


def online_train_loop(
    train_state: Any,
    step_fn: StepFn,
    load_dataset: DatasetLoader,
    config: OnlineLoopConfig,
    batch_prep: Optional[Callable[[Dict[str, np.ndarray]], Any]] = None,
    evaluator: Optional[Evaluator] = None,
    module_getter: Optional[Callable[[Any], Dict[str, Any]]] = None,
    module_configs: Optional[Dict[str, dict]] = None,
    loop_state: Optional[LoopState] = None,
) -> Tuple[Any, LoopState]:
    rng = jax.random.PRNGKey(config.seed)
    data_rng = np.random.default_rng(config.seed)
    loop_state = loop_state or LoopState()
    manager = CheckpointManager(config.save_dir, config.max_checkpoints)

    def modules():
        assert module_getter is not None
        return module_getter(train_state)

    def maybe_eval():
        if evaluator is None:
            return
        perf, eval_logs = evaluator(train_state)
        log(
            label_logs(
                pull_logs(eval_logs),
                "eval",
                {"round": loop_state.round, "step": loop_state.step},
            ),
            use_wandb=config.use_wandb,
        )
        if config.save_best and perf > loop_state.best_perf and config.save_dir:
            loop_state.best_perf = perf
            manager.save(
                "best", loop_state, modules(), module_configs, rolling=False
            )

    start_round = loop_state.round
    for round_idx in range(start_round, config.n_rounds):
        loop_state.round = round_idx
        dataset = load_dataset(train_state, round_idx)
        if dataset is None:
            # empty filter result → skip the round
            # (online_filtered_bc/train.py:225-231)
            continue

        step_logs = []
        for _epoch in range(config.epochs_per_round):
            for batch in dataset.batches(config.train_bsize, rng=data_rng, drop_last=False):
                rng, step_rng = jax.random.split(rng)
                prepared = batch_prep(batch) if batch_prep else batch
                train_state, loss, logs = step_fn(train_state, prepared, step_rng)
                step_logs.append(logs)
                loop_state.step += 1
                if config.log_every and loop_state.step % config.log_every == 0:
                    log(
                        label_logs(
                            pull_logs(combine_logs(step_logs)),
                            "train",
                            {"round": round_idx, "step": loop_state.step},
                        ),
                        use_wandb=config.use_wandb,
                    )
                    step_logs = []

        if config.eval_every_rounds and (round_idx + 1) % config.eval_every_rounds == 0:
            maybe_eval()
        if config.save_every_rounds and (round_idx + 1) % config.save_every_rounds == 0 and config.save_dir:
            manager.save(
                f"round_{round_idx}", loop_state, modules(), module_configs,
                save_train_state=config.save_train_state,
            )

    loop_state.round = config.n_rounds
    if config.save_at_end and config.save_dir:
        manager.save(
            "last", loop_state, modules(), module_configs,
            save_train_state=config.save_train_state,
        )
    return train_state, loop_state
