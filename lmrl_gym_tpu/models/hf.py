"""HuggingFace checkpoint interop (import + export).

Replaces the reference's `ModelLoadMode.HF` load path and its HF-format
export (reference: JaxSeq models/gpt2/load.py consumers, SURVEY.md §2.9;
LLM_RL/algorithms/checkpoints.py:8-34 export). Works directly on a
`transformers` *torch* state dict — torch here is CPU-only weight
plumbing; all compute stays in JAX.

Layout notes (verified against `transformers` modeling code by parity
tests in tests/test_hf.py):

- GPT-2 `Conv1D` stores weights [in, out] — identical to a flax Dense
  kernel, so c_attn/c_proj/c_fc copy over without transposition. Our
  fused qkv Dense matches c_attn's (q|k|v) output concatenation.
- GPT-J uses separate q/k/v torch Linear (weight [out, in] → transpose,
  no bias) and the interleaved rotary convention
  (config.rotary_interleaved=True).
- Vocab rows above `vocab_size` (our shardable padding) are zero-filled
  on import and stripped on export.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lmrl_gym_tpu.models.config import TransformerConfig


def _np(t) -> np.ndarray:
    """torch tensor (or array) → float32 numpy without importing torch."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def _pad_rows(x: np.ndarray, rows: int) -> np.ndarray:
    if x.shape[0] == rows:
        return x
    out = np.zeros((rows,) + x.shape[1:], x.dtype)
    out[: x.shape[0]] = x
    return out


def config_from_hf(hf_config) -> TransformerConfig:
    """Map a transformers GPT2Config / GPTJConfig to TransformerConfig."""
    t = hf_config.model_type
    if t == "gpt2":
        return TransformerConfig(
            vocab_size=hf_config.vocab_size,
            max_position_embeddings=hf_config.n_positions,
            hidden_size=hf_config.n_embd,
            num_layers=hf_config.n_layer,
            num_heads=hf_config.n_head,
            intermediate_size=hf_config.n_inner,
            activation=hf_config.activation_function,
            position_embedding="learned",
            layer_norm_epsilon=hf_config.layer_norm_epsilon,
            tie_word_embeddings=True,
            embd_pdrop=hf_config.embd_pdrop,
            resid_pdrop=hf_config.resid_pdrop,
            attn_pdrop=hf_config.attn_pdrop,
            initializer_range=hf_config.initializer_range,
        )
    if t == "gptj":
        return TransformerConfig(
            vocab_size=hf_config.vocab_size,
            max_position_embeddings=hf_config.n_positions,
            hidden_size=hf_config.n_embd,
            num_layers=hf_config.n_layer,
            num_heads=hf_config.n_head,
            intermediate_size=hf_config.n_inner,
            activation=hf_config.activation_function,
            position_embedding="rotary",
            rotary_dim=hf_config.rotary_dim,
            rotary_interleaved=True,
            parallel_ffn=True,
            layer_norm_epsilon=hf_config.layer_norm_epsilon,
            tie_word_embeddings=False,
            embd_pdrop=hf_config.embd_pdrop,
            resid_pdrop=hf_config.resid_pdrop,
            attn_pdrop=hf_config.attn_pdrop,
            initializer_range=hf_config.initializer_range,
        )
    if t == "llama":
        if getattr(hf_config, "num_key_value_heads", hf_config.num_attention_heads) != (
            hf_config.num_attention_heads
        ):
            raise ValueError("GQA (num_key_value_heads < num_heads) not supported yet")
        return TransformerConfig(
            vocab_size=hf_config.vocab_size,
            max_position_embeddings=hf_config.max_position_embeddings,
            hidden_size=hf_config.hidden_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.intermediate_size,
            activation="silu",
            position_embedding="rotary",
            rotary_base=getattr(hf_config, "rope_theta", 10000.0),
            norm="rmsnorm",
            gated_mlp=True,
            attn_bias=False,
            mlp_bias=False,
            lm_head_bias=False,
            tie_word_embeddings=bool(getattr(hf_config, "tie_word_embeddings", False)),
            layer_norm_epsilon=hf_config.rms_norm_eps,
            embd_pdrop=0.0,
            resid_pdrop=0.0,
            attn_pdrop=0.0,
            initializer_range=hf_config.initializer_range,
        )
    raise ValueError(f"unsupported HF model_type: {t}")


def params_from_hf_state_dict(
    state: Mapping[str, Any], config: TransformerConfig
) -> Dict[str, Any]:
    """HF torch state dict → our flax param pytree (float32 numpy leaves)."""
    V = config.padded_vocab_size
    sd = {k: _np(v) for k, v in state.items()}
    if any(k.startswith("model.embed_tokens") for k in sd):
        return _params_from_llama(sd, config)
    # strip the "transformer." prefix HF *ForCausalLM wrappers add
    sd = {k.removeprefix("transformer."): v for k, v in sd.items()}

    is_gptj = config.position_embedding == "rotary"
    params: Dict[str, Any] = {
        "wte": {"embedding": _pad_rows(sd["wte.weight"], V)},
        "ln_f": {"scale": sd["ln_f.weight"], "bias": sd["ln_f.bias"]},
    }
    if config.position_embedding == "learned":
        params["wpe"] = {"embedding": sd["wpe.weight"]}

    D = config.hidden_size
    for i in range(config.num_layers):
        p = f"h.{i}."
        blk: Dict[str, Any] = {
            "ln_1": {"scale": sd[p + "ln_1.weight"], "bias": sd[p + "ln_1.bias"]},
        }
        if is_gptj:
            qkv_w = np.concatenate(
                [
                    sd[p + "attn.q_proj.weight"].T,
                    sd[p + "attn.k_proj.weight"].T,
                    sd[p + "attn.v_proj.weight"].T,
                ],
                axis=1,
            )
            blk["attn"] = {
                "qkv": {"kernel": qkv_w, "bias": np.zeros(3 * D, np.float32)},
                "out": {
                    "kernel": sd[p + "attn.out_proj.weight"].T,
                    "bias": np.zeros(D, np.float32),
                },
            }
            blk["mlp"] = {
                "fc": {
                    "kernel": sd[p + "mlp.fc_in.weight"].T,
                    "bias": sd[p + "mlp.fc_in.bias"],
                },
                "proj": {
                    "kernel": sd[p + "mlp.fc_out.weight"].T,
                    "bias": sd[p + "mlp.fc_out.bias"],
                },
            }
        else:
            blk["attn"] = {
                "qkv": {
                    "kernel": sd[p + "attn.c_attn.weight"],
                    "bias": sd[p + "attn.c_attn.bias"],
                },
                "out": {
                    "kernel": sd[p + "attn.c_proj.weight"],
                    "bias": sd[p + "attn.c_proj.bias"],
                },
            }
            blk["ln_2"] = {
                "scale": sd[p + "ln_2.weight"],
                "bias": sd[p + "ln_2.bias"],
            }
            blk["mlp"] = {
                "fc": {
                    "kernel": sd[p + "mlp.c_fc.weight"],
                    "bias": sd[p + "mlp.c_fc.bias"],
                },
                "proj": {
                    "kernel": sd[p + "mlp.c_proj.weight"],
                    "bias": sd[p + "mlp.c_proj.bias"],
                },
            }
        params[f"h_{i}"] = blk

    if not config.tie_word_embeddings:
        params["lm_head"] = {
            "kernel": _pad_rows(sd["lm_head.weight"], V).T
            if "lm_head.weight" in sd
            else np.zeros((D, V), np.float32),
        }
        if "lm_head.bias" in sd:
            params["lm_head"]["bias"] = _pad_rows(sd["lm_head.bias"][:, None], V)[:, 0]
        else:
            params["lm_head"]["bias"] = np.zeros(V, np.float32)
    return params


def _params_from_llama(sd: Dict[str, np.ndarray], config: TransformerConfig) -> Dict[str, Any]:
    """HF LlamaForCausalLM layout → flax tree. RMSNorm has scale only;
    all projections bias-free; MLP is SwiGLU (gate_proj→fc, up_proj→gate,
    down_proj→proj per models/transformer.py naming)."""
    V = config.padded_vocab_size
    params: Dict[str, Any] = {
        "wte": {"embedding": _pad_rows(sd["model.embed_tokens.weight"], V)},
        "ln_f": {"scale": sd["model.norm.weight"]},
    }
    for i in range(config.num_layers):
        p = f"model.layers.{i}."
        qkv_w = np.concatenate(
            [
                sd[p + "self_attn.q_proj.weight"].T,
                sd[p + "self_attn.k_proj.weight"].T,
                sd[p + "self_attn.v_proj.weight"].T,
            ],
            axis=1,
        )
        params[f"h_{i}"] = {
            "ln_1": {"scale": sd[p + "input_layernorm.weight"]},
            "ln_2": {"scale": sd[p + "post_attention_layernorm.weight"]},
            "attn": {
                "qkv": {"kernel": qkv_w},
                "out": {"kernel": sd[p + "self_attn.o_proj.weight"].T},
            },
            "mlp": {
                "fc": {"kernel": sd[p + "mlp.gate_proj.weight"].T},
                "gate": {"kernel": sd[p + "mlp.up_proj.weight"].T},
                "proj": {"kernel": sd[p + "mlp.down_proj.weight"].T},
            },
        }
    if not config.tie_word_embeddings:
        lm_w = sd.get("lm_head.weight", sd["model.embed_tokens.weight"])
        params["lm_head"] = {"kernel": _pad_rows(lm_w, V).T}
    return params


def params_to_hf_state_dict(params: Any, config: TransformerConfig) -> Dict[str, np.ndarray]:
    """Our flax params → HF torch-layout state dict (numpy float32 values).

    Inverse of params_from_hf_state_dict; padded vocab rows are stripped.
    The caller can `model.load_state_dict({k: torch.from_numpy(v) ...})`
    then `save_pretrained` for the reference's HF export flow
    (LLM_RL/algorithms/checkpoints.py:8-27).
    """
    p = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    Vt = config.vocab_size
    if config.norm == "rmsnorm":
        return _params_to_llama(p, config)
    is_gptj = config.position_embedding == "rotary"
    out: Dict[str, np.ndarray] = {
        "transformer.wte.weight": p["wte"]["embedding"][:Vt],
        "transformer.ln_f.weight": p["ln_f"]["scale"],
        "transformer.ln_f.bias": p["ln_f"]["bias"],
    }
    if config.position_embedding == "learned":
        out["transformer.wpe.weight"] = p["wpe"]["embedding"]
    D = config.hidden_size
    for i in range(config.num_layers):
        blk = p[f"h_{i}"]
        t = f"transformer.h.{i}."
        out[t + "ln_1.weight"] = blk["ln_1"]["scale"]
        out[t + "ln_1.bias"] = blk["ln_1"]["bias"]
        if is_gptj:
            qkv = blk["attn"]["qkv"]["kernel"]
            out[t + "attn.q_proj.weight"] = qkv[:, :D].T
            out[t + "attn.k_proj.weight"] = qkv[:, D : 2 * D].T
            out[t + "attn.v_proj.weight"] = qkv[:, 2 * D :].T
            out[t + "attn.out_proj.weight"] = blk["attn"]["out"]["kernel"].T
            out[t + "mlp.fc_in.weight"] = blk["mlp"]["fc"]["kernel"].T
            out[t + "mlp.fc_in.bias"] = blk["mlp"]["fc"]["bias"]
            out[t + "mlp.fc_out.weight"] = blk["mlp"]["proj"]["kernel"].T
            out[t + "mlp.fc_out.bias"] = blk["mlp"]["proj"]["bias"]
        else:
            out[t + "attn.c_attn.weight"] = blk["attn"]["qkv"]["kernel"]
            out[t + "attn.c_attn.bias"] = blk["attn"]["qkv"]["bias"]
            out[t + "attn.c_proj.weight"] = blk["attn"]["out"]["kernel"]
            out[t + "attn.c_proj.bias"] = blk["attn"]["out"]["bias"]
            out[t + "ln_2.weight"] = blk["ln_2"]["scale"]
            out[t + "ln_2.bias"] = blk["ln_2"]["bias"]
            out[t + "mlp.c_fc.weight"] = blk["mlp"]["fc"]["kernel"]
            out[t + "mlp.c_fc.bias"] = blk["mlp"]["fc"]["bias"]
            out[t + "mlp.c_proj.weight"] = blk["mlp"]["proj"]["kernel"]
            out[t + "mlp.c_proj.bias"] = blk["mlp"]["proj"]["bias"]
    if config.tie_word_embeddings:
        out["lm_head.weight"] = out["transformer.wte.weight"]
    else:
        out["lm_head.weight"] = p["lm_head"]["kernel"][:, :Vt].T
        if "bias" in p["lm_head"]:
            out["lm_head.bias"] = p["lm_head"]["bias"][:Vt]
    return out


def _params_to_llama(p: Dict[str, Any], config: TransformerConfig) -> Dict[str, np.ndarray]:
    Vt = config.vocab_size
    D = config.hidden_size
    out: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": p["wte"]["embedding"][:Vt],
        "model.norm.weight": p["ln_f"]["scale"],
    }
    for i in range(config.num_layers):
        blk = p[f"h_{i}"]
        t = f"model.layers.{i}."
        qkv = blk["attn"]["qkv"]["kernel"]
        out[t + "input_layernorm.weight"] = blk["ln_1"]["scale"]
        out[t + "post_attention_layernorm.weight"] = blk["ln_2"]["scale"]
        out[t + "self_attn.q_proj.weight"] = qkv[:, :D].T
        out[t + "self_attn.k_proj.weight"] = qkv[:, D : 2 * D].T
        out[t + "self_attn.v_proj.weight"] = qkv[:, 2 * D :].T
        out[t + "self_attn.o_proj.weight"] = blk["attn"]["out"]["kernel"].T
        out[t + "mlp.gate_proj.weight"] = blk["mlp"]["fc"]["kernel"].T
        out[t + "mlp.up_proj.weight"] = blk["mlp"]["gate"]["kernel"].T
        out[t + "mlp.down_proj.weight"] = blk["mlp"]["proj"]["kernel"].T
    if config.tie_word_embeddings:
        out["lm_head.weight"] = out["model.embed_tokens.weight"]
    else:
        out["lm_head.weight"] = p["lm_head"]["kernel"][:, :Vt].T
    return out


# ---------------- T5 (encoder-decoder) ----------------


def encdec_config_from_hf(hf_config) -> "EncDecConfig":
    """transformers T5Config → EncDecConfig (reference oracle family,
    twenty_questions/env/oracle.py:20)."""
    from lmrl_gym_tpu.models.encdec import EncDecConfig

    assert hf_config.model_type == "t5", hf_config.model_type
    proj = getattr(hf_config, "feed_forward_proj", "relu")
    proj = "gated-gelu" if "gated" in proj else "relu"
    return EncDecConfig(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.d_model,
        d_kv=hf_config.d_kv,
        d_ff=hf_config.d_ff,
        num_layers=hf_config.num_layers,
        num_decoder_layers=getattr(hf_config, "num_decoder_layers", None),
        num_heads=hf_config.num_heads,
        relative_attention_num_buckets=hf_config.relative_attention_num_buckets,
        relative_attention_max_distance=getattr(
            hf_config, "relative_attention_max_distance", 128
        ),
        feed_forward_proj=proj,
        layer_norm_epsilon=hf_config.layer_norm_epsilon,
        dropout_rate=hf_config.dropout_rate,
        tie_word_embeddings=bool(getattr(hf_config, "tie_word_embeddings", True)),
        decoder_start_token_id=hf_config.decoder_start_token_id,
        pad_token_id=hf_config.pad_token_id,
    )


def _t5_attn(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {
        "q": {"kernel": sd[prefix + "q.weight"].T},
        "k": {"kernel": sd[prefix + "k.weight"].T},
        "v": {"kernel": sd[prefix + "v.weight"].T},
        "o": {"kernel": sd[prefix + "o.weight"].T},
    }


def _t5_mlp(sd: Dict[str, np.ndarray], prefix: str, gated: bool) -> Dict[str, Any]:
    if gated:
        return {
            "wi_0": {"kernel": sd[prefix + "wi_0.weight"].T},
            "wi_1": {"kernel": sd[prefix + "wi_1.weight"].T},
            "wo": {"kernel": sd[prefix + "wo.weight"].T},
        }
    return {
        "wi": {"kernel": sd[prefix + "wi.weight"].T},
        "wo": {"kernel": sd[prefix + "wo.weight"].T},
    }


def encdec_params_from_hf_state_dict(state: Mapping[str, Any], config) -> Dict[str, Any]:
    """HF T5ForConditionalGeneration state dict → our flax tree."""
    sd = {k: _np(v) for k, v in state.items()}
    V = config.padded_vocab_size
    gated = config.feed_forward_proj == "gated-gelu"
    params: Dict[str, Any] = {
        "shared": {"embedding": _pad_rows(sd["shared.weight"], V)},
        "enc_rel_bias": {
            "embedding": sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
        },
        "dec_rel_bias": {
            "embedding": sd["decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
        },
        "enc_ln_f": {"scale": sd["encoder.final_layer_norm.weight"]},
        "dec_ln_f": {"scale": sd["decoder.final_layer_norm.weight"]},
    }
    for i in range(config.num_layers):
        p = f"encoder.block.{i}."
        params[f"enc_blocks_{i}"] = {
            "ln_self": {"scale": sd[p + "layer.0.layer_norm.weight"]},
            "self_attn": _t5_attn(sd, p + "layer.0.SelfAttention."),
            "ln_mlp": {"scale": sd[p + "layer.1.layer_norm.weight"]},
            "mlp": _t5_mlp(sd, p + "layer.1.DenseReluDense.", gated),
        }
    for i in range(config.n_dec_layers):
        p = f"decoder.block.{i}."
        params[f"dec_blocks_{i}"] = {
            "ln_self": {"scale": sd[p + "layer.0.layer_norm.weight"]},
            "self_attn": _t5_attn(sd, p + "layer.0.SelfAttention."),
            "ln_cross": {"scale": sd[p + "layer.1.layer_norm.weight"]},
            "cross_attn": _t5_attn(sd, p + "layer.1.EncDecAttention."),
            "ln_mlp": {"scale": sd[p + "layer.2.layer_norm.weight"]},
            "mlp": _t5_mlp(sd, p + "layer.2.DenseReluDense.", gated),
        }
    if not config.tie_word_embeddings:
        params["lm_head"] = {"kernel": _pad_rows(sd["lm_head.weight"], V).T}
    return params


def encdec_params_to_hf_state_dict(params: Any, config) -> Dict[str, np.ndarray]:
    """Inverse of encdec_params_from_hf_state_dict (padding stripped)."""
    p = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    Vt = config.vocab_size
    gated = config.feed_forward_proj == "gated-gelu"
    out: Dict[str, np.ndarray] = {
        "shared.weight": p["shared"]["embedding"][:Vt],
        "encoder.embed_tokens.weight": p["shared"]["embedding"][:Vt],
        "decoder.embed_tokens.weight": p["shared"]["embedding"][:Vt],
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight": p[
            "enc_rel_bias"
        ]["embedding"],
        "decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight": p[
            "dec_rel_bias"
        ]["embedding"],
        "encoder.final_layer_norm.weight": p["enc_ln_f"]["scale"],
        "decoder.final_layer_norm.weight": p["dec_ln_f"]["scale"],
    }

    def put_attn(dst: str, attn: Dict[str, Any]):
        for n in ("q", "k", "v", "o"):
            out[dst + f"{n}.weight"] = attn[n]["kernel"].T

    def put_mlp(dst: str, mlp: Dict[str, Any]):
        names = ("wi_0", "wi_1", "wo") if gated else ("wi", "wo")
        for n in names:
            out[dst + f"{n}.weight"] = mlp[n]["kernel"].T

    for i in range(config.num_layers):
        blk = p[f"enc_blocks_{i}"]
        t = f"encoder.block.{i}."
        out[t + "layer.0.layer_norm.weight"] = blk["ln_self"]["scale"]
        put_attn(t + "layer.0.SelfAttention.", blk["self_attn"])
        out[t + "layer.1.layer_norm.weight"] = blk["ln_mlp"]["scale"]
        put_mlp(t + "layer.1.DenseReluDense.", blk["mlp"])
    for i in range(config.n_dec_layers):
        blk = p[f"dec_blocks_{i}"]
        t = f"decoder.block.{i}."
        out[t + "layer.0.layer_norm.weight"] = blk["ln_self"]["scale"]
        put_attn(t + "layer.0.SelfAttention.", blk["self_attn"])
        out[t + "layer.1.layer_norm.weight"] = blk["ln_cross"]["scale"]
        put_attn(t + "layer.1.EncDecAttention.", blk["cross_attn"])
        out[t + "layer.2.layer_norm.weight"] = blk["ln_mlp"]["scale"]
        put_mlp(t + "layer.2.DenseReluDense.", blk["mlp"])
    if config.tie_word_embeddings:
        out["lm_head.weight"] = out["shared.weight"]
    else:
        out["lm_head.weight"] = p["lm_head"]["kernel"][:, :Vt].T
    return out


def load_hf_pretrained(name_or_path: str):
    """(config, params) from a local HF checkpoint directory.

    Zero-egress environments must pass a local path (HF_HUB_OFFLINE).
    """
    import transformers

    hf_model = transformers.AutoModelForCausalLM.from_pretrained(name_or_path)
    config = config_from_hf(hf_model.config)
    params = params_from_hf_state_dict(hf_model.state_dict(), config)
    return config, params


def export_hf_pretrained(
    params: Any, config: TransformerConfig, path: str, tokenizer=None
) -> None:
    """Write a transformers-loadable checkpoint dir (reference
    algorithms/checkpoints.py:8-27 equivalent, minus GCS)."""
    import torch
    import transformers

    if config.norm == "rmsnorm":
        hf_config = transformers.LlamaConfig(
            vocab_size=config.vocab_size,
            max_position_embeddings=config.max_position_embeddings,
            hidden_size=config.hidden_size,
            num_hidden_layers=config.num_layers,
            num_attention_heads=config.num_heads,
            num_key_value_heads=config.num_heads,
            intermediate_size=config.intermediate_size,
            rope_theta=config.rotary_base,
            rms_norm_eps=config.layer_norm_epsilon,
            tie_word_embeddings=config.tie_word_embeddings,
        )
        model = transformers.LlamaForCausalLM(hf_config)
    elif config.position_embedding == "learned":
        hf_config = transformers.GPT2Config(
            vocab_size=config.vocab_size,
            n_positions=config.max_position_embeddings,
            n_embd=config.hidden_size,
            n_layer=config.num_layers,
            n_head=config.num_heads,
            n_inner=config.intermediate_size,
            activation_function=config.activation,
            layer_norm_epsilon=config.layer_norm_epsilon,
        )
        model = transformers.GPT2LMHeadModel(hf_config)
    else:
        hf_config = transformers.GPTJConfig(
            vocab_size=config.vocab_size,
            n_positions=config.max_position_embeddings,
            n_embd=config.hidden_size,
            n_layer=config.num_layers,
            n_head=config.num_heads,
            n_inner=config.intermediate_size,
            rotary_dim=config.rotary_dim,
            activation_function=config.activation,
            layer_norm_epsilon=config.layer_norm_epsilon,
            tie_word_embeddings=False,
        )
        model = transformers.GPTJForCausalLM(hf_config)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in params_to_hf_state_dict(params, config).items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # only buffers (attn.bias causal masks) may be missing
    real_missing = [k for k in missing if not k.endswith((".attn.bias", ".attn.masked_bias"))]
    if real_missing or unexpected:
        raise ValueError(f"state dict mismatch: missing={real_missing} unexpected={unexpected}")
    model.save_pretrained(path)
    if tokenizer is not None:
        tokenizer.save_pretrained(path)
