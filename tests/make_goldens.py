"""Generate golden fixtures from the reference implementation.

Run manually (requires /root/reference):
    python tests/make_goldens.py

Produces tests/goldens/*.json capturing reference-env trajectories under
fixed seeds — the BASELINE.json "env trajectories and rewards match the
reference exactly under fixed seed" gate. Tests consume the JSON only; the
reference tree is not needed at test time.
"""
import json
import os
import random
import sys

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
REFERENCE = "/root/reference"


def make_wordle_goldens():
    sys.path.insert(0, REFERENCE)
    from llm_rl_scripts.wordle.env.game import Vocabulary, WordleGame

    vocab_path = os.path.join(
        REFERENCE, "llm_rl_scripts/wordle/vocab/wordle_official_400.txt"
    )
    episodes = []
    for seed in range(20):
        rng = random.Random(seed)
        vocab = Vocabulary.from_file(vocab_path, fill_cache=False, rng=rng)
        game = WordleGame.initialize(vocab)
        # action selection from an independent rng so the env-side rng
        # stream is exactly what the env implementation consumes
        act_rng = random.Random(1000 + seed)
        steps = []
        done = False
        while not done:
            if act_rng.random() < 0.1:
                action = "zzzzz"  # invalid: not in vocab
            else:
                action = act_rng.choice(vocab.all_vocab)
            game, reward, done = game.next(action)
            feedback = game.transition_sequence()[-1]
            steps.append(
                dict(action=action, feedback=feedback, reward=reward, done=done)
            )
        episodes.append(dict(seed=seed, steps=steps))
    with open(os.path.join(GOLDEN_DIR, "wordle.json"), "w") as f:
        json.dump(episodes, f, indent=1)
    print(f"wordle: {len(episodes)} episodes")


def make_maze_goldens():
    sys.path.insert(0, REFERENCE)
    from llm_rl_scripts.maze.env.env import (
        MazeEnv,
        describe_observation_give_position,
        standard_reward,
        manhatten_actions,
    )
    import numpy as np
    from LLM_RL.environment import Text

    # double_t_maze grid inlined (reference mazes.py pulls in skimage,
    # which is absent here; the grid itself is ours from envs/maze/grids.py)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lmrl_gym_tpu.envs.maze.grids import double_t_maze

    maze = double_t_maze()
    goal = np.asarray([[8, 6]])
    episodes = []
    for seed in range(20):
        env = MazeEnv(
            maze=maze,
            valid_goals=goal,
            actions=manhatten_actions,
            max_steps=100,
            describe_function=describe_observation_give_position,
            reward_function=standard_reward,
        )
        obs0 = env.reset(seed=seed)
        act_rng = random.Random(2000 + seed)
        steps = []
        history = obs0
        done = False
        actions = list(manhatten_actions.keys()) + ["fly\n"]
        while not done and len(steps) < 60:
            action = act_rng.choice(actions)
            history = history + (Text(action, True),)
            history, reward, done = env.step(history)
            steps.append(
                dict(
                    action=action,
                    obs="".join(t.text for t in history),
                    reward=reward,
                    done=done,
                )
            )
        episodes.append(
            dict(
                seed=seed,
                initial_obs=obs0[0].text,
                goal=list(env.goal),
                steps=steps,
            )
        )
    with open(os.path.join(GOLDEN_DIR, "maze.json"), "w") as f:
        json.dump(episodes, f, indent=1)
    print(f"maze: {len(episodes)} episodes")


def make_maze_optimal_table_golden():
    # transcribed from reference mazes.py:20-48 double_t_maze_optimal_directions
    # (the module itself imports skimage, absent here)
    ref = {
        (1, 1): "move right\n", (1, 2): "move right\n", (1, 3): "move down\n",
        (1, 4): "move left\n", (1, 5): "move left\n", (1, 7): "move right\n",
        (1, 8): "move right\n", (1, 9): "move down\n", (1, 10): "move left\n",
        (1, 11): "move left\n", (2, 3): "move down\n", (3, 3): "move down\n",
        (4, 3): "move down\n", (5, 3): "move right\n", (5, 4): "move right\n",
        (5, 5): "move right\n", (5, 6): "move down\n", (6, 6): "move down\n",
        (7, 6): "move down\n", (5, 7): "move left\n", (5, 8): "move left\n",
        (5, 9): "move left\n", (4, 9): "move down\n", (3, 9): "move down\n",
        (2, 9): "move down\n",
    }
    table = {f"{y},{x}": v for (y, x), v in ref.items()}
    with open(os.path.join(GOLDEN_DIR, "maze_optimal_directions.json"), "w") as f:
        json.dump(table, f, indent=1)
    print(f"maze optimal table: {len(table)} cells")


def make_chess_text_goldens():
    """Chess text protocol (chess/env/env.py:13-26): the module itself
    needs python-chess + a stockfish binary (absent here), but the four
    text-protocol functions are dependency-free — exec just their source
    so the goldens are produced by the reference's own code."""
    import re as _re

    src = open(os.path.join(REFERENCE, "llm_rl_scripts/chess/env/env.py")).read()
    ns = {}
    for fn in (
        "preprocess_move",
        "postprocess_move",
        "preprocess_state",
        "preprocess_state_og",
        "postprocess_state",
    ):
        m = _re.search(rf"(def {fn}\(.*?\n(?:    .*\n|\n)*)", src)
        assert m, fn
        exec(m.group(1), ns)

    fens = [
        "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0 1",
        "8/8/8/4k3/8/8/4Q3/4K3 w - - 0 1",
        "r1bqkb1r/pppp1ppp/2n2n2/4p3/2B1P3/5N2/PPPP1PPP/RNBQK2R w KQkq - 4 4",
        "8/5k2/8/8/3Q4/8/5K2/8 b - - 12 45",
    ]
    moves = ["e4", "Nf3", "Qxe5+", "O-O", "O-O-O", "exd5", "e8=Q#", "Rad1"]
    cases = dict(
        preprocess_move={m: ns["preprocess_move"](m) for m in moves},
        postprocess_move={
            ns["preprocess_move"](m): ns["postprocess_move"](ns["preprocess_move"](m))
            for m in moves
        },
        preprocess_state={f: ns["preprocess_state"](f) for f in fens},
        preprocess_state_og={f: ns["preprocess_state_og"](f) for f in fens},
        postprocess_state={
            ns["preprocess_state_og"](f): ns["postprocess_state"](
                ns["preprocess_state_og"](f)
            )
            for f in fens
        },
    )
    with open(os.path.join(GOLDEN_DIR, "chess_text.json"), "w") as f:
        json.dump(cases, f, indent=1)
    print(f"chess text: {sum(len(v) for v in cases.values())} cases")


def make_chess_game_goldens():
    """Full-game behavioral goldens for ChessGame (VERDICT r2 item 6).

    The reference generates these with python-chess random-opponent games
    (chess/env/env.py:172-184), but python-chess is not installable here;
    instead the games are generated through the repo's ChessGame whose
    rules layer is the perft-validated native engine — pinning the step
    SEMANTICS (illegal SAN → −1 and board unchanged, mate +1/−1, draw 0,
    opponent reply determinism under seed) as regression goldens."""
    sys.path.insert(0, os.path.dirname(GOLDEN_DIR.rstrip("/")) )
    sys.path.insert(0, os.path.dirname(os.path.dirname(GOLDEN_DIR)))
    from lmrl_gym_tpu.envs.chess.engine import Board
    from lmrl_gym_tpu.envs.chess.env import ChessGame, large_piece_random_endgame

    games = []
    for gi in range(6):
        rng = random.Random(1000 + gi)
        if gi < 3:
            start = None  # full game from the initial position
        else:
            start = large_piece_random_endgame("kQK", random.Random(50 + gi))
        game = ChessGame(
            from_position=start, random_opponent=True, rng=random.Random(77 + gi)
        )
        fen, _ = game.reset()
        steps = []
        for t in range(40):
            legal = Board(game.board.fen).legal_moves_san()
            if t % 4 == 3:
                action = "Qz9"  # malformed → illegal path
            else:
                action = rng.choice(legal)
            new_fen, reward, done, info = game.step(action)
            steps.append(
                dict(action=action, fen=new_fen, reward=reward, done=done,
                     opponent=info.get("opponent move"))
            )
            if done:
                break
        games.append(dict(seed=77 + gi, action_seed=1000 + gi, start=fen, steps=steps))

    # scripted mate-in-1 pins the +1 terminal: Kf6+Qg1 vs kh8, Qg7#
    game = ChessGame(
        from_position="7k/8/5K2/8/8/8/8/6Q1 w - - 0 1",
        random_opponent=True, rng=random.Random(5),
    )
    fen, _ = game.reset()
    new_fen, reward, done, info = game.step("Qg7#")
    assert reward == 1.0 and done, (new_fen, reward, done)
    games.append(dict(
        seed=5, action_seed=None, start=fen,
        steps=[dict(action="Qg7#", fen=new_fen, reward=reward, done=done,
                    opponent=info.get("opponent move"))],
    ))
    with open(os.path.join(GOLDEN_DIR, "chess_game.json"), "w") as f:
        json.dump(games, f, indent=1)
    print(f"chess games: {len(games)} games, {sum(len(g['steps']) for g in games)} steps")


def _text_history(items):
    sys.path.insert(0, REFERENCE)
    from LLM_RL.environment import Text

    return tuple(Text(t, a) for t, a in items)


def make_twenty_questions_goldens():
    """Trajectory builder + reward rules + question validation
    (twenty_questions/env/data.py).

    NOTE on is_done (data.py:351-391): it needs the nltk perceptron
    tagger, whose model data is not present in this zero-egress image, so
    its exact outputs are NOT capturable here. We capture builder
    trajectories only on paths that do not reach is_done (final answer
    "No." / max-length cut — the `and` in data.py:109 short-circuits).
    The repo's is_done mirrors the reference algorithm over a
    dependency-free tagger (documented divergence,
    lmrl_gym_tpu/envs/twenty_questions/data.py:145)."""
    sys.path.insert(0, REFERENCE)
    from llm_rl_scripts.twenty_questions.env import data as ref_data

    # WordVariants.from_list pos-tags eagerly via nltk; stub the tagging
    # for construction only (pos_tags unused on the captured paths).
    ref_data.nltk.word_tokenize = lambda s: s.split()
    ref_data.nltk.pos_tag = lambda toks: [(t, "NN") for t in toks]

    words = ref_data.get_default_word_list()
    by_name = {w.words[0].lower(): w for w in words}

    convs = [
        # (word, [(q, a)...]) — final answer "No." or max-length so the
        # nltk-dependent guess check is never invoked
        ("basketball", [("Is it an animal?", "No."), ("Is it a sport?", "Yes."),
                        ("Is it red?", "No.")]),
        ("cat", [("Is it an animal?", "Yes."), ("Is it a dog?", "No.")]),
        ("piano", [("Is it big?", "No.")]),
        ("car", [(f"Is it thing {i}?", "No.") for i in range(20)]),  # max-length cut
    ]
    traj_cases = []
    for name, qa in convs:
        history = [(ref_data.INITIAL_STR, False)]
        for q, a in qa:
            history.append((q + "\n", True))
            history.append((a + "\n", False))
        tt = ref_data.create_trajectory_from_history(
            by_name[name], _text_history(history)
        )
        traj_cases.append(
            dict(
                word=name,
                history=[[t.text, t.is_action] for t in tt.text_history],
                reward=list(tt.reward),
                done=bool(tt.done),
            )
        )

    postproc_cases = {
        q: ref_data.asker_postproc(q)
        for q in [
            "is it an animal",
            "Is it a cat?",
            "tell me the answer",
            "",
            "Does it fly",
            "Could it be " + "very " * 45 + "big?",
            "Are you sure etc.?",
        ]
    }
    rtg_cases = {str(r): ref_data.rtg_to_token_str(r) for r in [0, -1, -5.0, -20]}
    with open(os.path.join(GOLDEN_DIR, "twenty_questions.json"), "w") as f:
        json.dump(
            dict(
                initial_str=ref_data.INITIAL_STR,
                invalid_question=ref_data.INVALID_QUESTION,
                trajectories=traj_cases,
                asker_postproc=postproc_cases,
                is_done="not capturable offline: nltk tagger data absent "
                "(see make_twenty_questions_goldens docstring)",
                rtg_tokens=rtg_cases,
            ),
            f,
            indent=1,
        )
    print(f"twenty_questions: {len(traj_cases)} trajectories")


def make_guess_city_goldens():
    """Same nltk caveat as make_twenty_questions_goldens: capture only
    builder paths that short-circuit before is_done."""
    sys.path.insert(0, REFERENCE)
    from llm_rl_scripts.guess_city.env import data as ref_data

    ref_data.nltk.word_tokenize = lambda s: s.split()
    ref_data.nltk.pos_tag = lambda toks: [(t, "NN") for t in toks]

    # the reference loads its city list via a cwd-relative path
    cwd = os.getcwd()
    os.chdir(REFERENCE)
    try:
        words = ref_data.get_default_word_list()
    finally:
        os.chdir(cwd)
    cases = []
    for word, qa in [
        (words[0], [("Is it in Asia?", "Yes."), ("Is it coastal?", "No.")]),
        (words[1], [("Is it in Europe?", "No.")]),
        (words[2], [(f"Is it city {i}?", "No.") for i in range(20)]),
    ]:
        history = [(ref_data.INITIAL_STR, False)]
        for q, a in qa:
            history.append((q + "\n", True))
            history.append((a + "\n", False))
        tt = ref_data.create_trajectory_from_history(word, _text_history(history))
        cases.append(
            dict(
                # the reference's get_default_word_list returns plain
                # "City,Country" strings (guess_city/env/data.py:49-64)
                word=word if isinstance(word, str) else word.words[0],
                history=[[t.text, t.is_action] for t in tt.text_history],
                reward=list(tt.reward),
                done=bool(tt.done),
            )
        )
    postproc = {
        q: ref_data.asker_postproc(q)
        for q in ["is it in asia", "Is it Tokyo?", "the city is big", ""]
    }
    INITIAL_STR = ref_data.INITIAL_STR
    with open(os.path.join(GOLDEN_DIR, "guess_city.json"), "w") as f:
        json.dump(
            dict(initial_str=INITIAL_STR, trajectories=cases, asker_postproc=postproc),
            f,
            indent=1,
        )
    print(f"guess_city: {len(cases)} trajectories")


def make_car_dealer_goldens():
    """Reward rules (data.py:130-173), verdict extraction (data.py:182-204),
    role-view trajectory builders (data.py:206-263)."""
    sys.path.insert(0, REFERENCE)
    from llm_rl_scripts.car_dealer.env.data import (
        Role,
        compute_reward,
        create_buyer_info_str,
        create_trajectory_from_conversation,
        extract_output_from_str,
    )

    buyer_info = {
        "personality": "impatient",
        "preferred_brands": "Toyota",
        "preferred_type": "SUV",
        "preferred_features": ["Sunroof", "Backup camera"],
        "budget": 40000,
    }
    outputs = [
        {"car_bought": True, "msrp": 45000, "buy_price": 38000},
        {"car_bought": True, "msrp": 30000, "buy_price": 30000},
        {"car_bought": False, "msrp": 45000, "buy_price": None},
        {"car_bought": False, "msrp": 35000, "buy_price": None},
    ]
    reward_cases = [
        dict(
            output=o,
            fancy=compute_reward(buyer_info, o, "fancy"),
            revenue=compute_reward(buyer_info, o, "revenue"),
        )
        for o in outputs
    ]
    extract_cases = []
    for line in [
        "Output: Decision=Accept MSRP=$45,000 Buy Price=$38,000",
        "Sounds good. Output: Decision=Accept MSRP=$30,000 Buy Price=$30,000\n",
        "Output: Decision=Reject MSRP=$45,000",
        "I'll think about it.",
        "Output: Decision=Accept MSRP=$1,000,000 Buy Price=$999,999 thanks",
    ]:
        out, extracted = extract_output_from_str(line)
        extract_cases.append(dict(line=line, output=out, extracted=extracted))

    conversation = {
        "buyer_info": buyer_info,
        "lines": [
            {"role": "seller", "text": "Welcome! Looking for anything special?"},
            {"role": "buyer", "text": "A Toyota SUV with a sunroof."},
            {"role": "seller", "text": "I have one at $38,000."},
            {"role": "buyer", "text": "Deal."},
        ],
        "output": outputs[0],
    }
    traj_cases = {}
    for role in (Role.SELLER, Role.BUYER):
        tt = create_trajectory_from_conversation(conversation, role)
        traj_cases[str(role)] = dict(
            history=[[t.text, t.is_action] for t in tt.text_history],
            reward=list(tt.reward),
            done=bool(tt.done),
        )
    with open(os.path.join(GOLDEN_DIR, "car_dealer.json"), "w") as f:
        json.dump(
            dict(
                buyer_info=buyer_info,
                buyer_info_str=create_buyer_info_str(buyer_info),
                rewards=reward_cases,
                extraction=extract_cases,
                trajectories=traj_cases,
            ),
            f,
            indent=1,
        )
    print(f"car_dealer: {len(reward_cases)} reward cases")


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    make_wordle_goldens()
    make_maze_goldens()
    make_maze_optimal_table_golden()
    make_chess_text_goldens()
    make_chess_game_goldens()
    make_twenty_questions_goldens()
    make_guess_city_goldens()
    make_car_dealer_goldens()
