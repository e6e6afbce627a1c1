"""Encoder-decoder (T5 family), TPU-first.

The reference's 20Q/Guess-My-City oracles are finetuned flan-t5-xl models
served through JaxSeq `T5Inference` (twenty_questions/env/oracle.py:8-9,
guess_city/env/oracle.py:20-68; SURVEY.md §2.9 base-model coverage). This
module completes that coverage with a from-scratch flax T5:

- exact T5 semantics (RMSNorm without mean-centering, relative-position
  bucket bias shared across layers, UNscaled dot-product attention, relu
  or gated-gelu FFN, tied-embedding logit scaling by d_model^-0.5) so HF
  T5/flan-T5 checkpoints import with bit-identical logits (models/hf.py);
- decode as the same `lax.scan` loop as the decoder-only family
  (models/generation.py): decoder self-attn KV cache + cross-attention
  K/V precomputed once from the encoder pass — no per-step re-encode;
- activations bfloat16, params float32, partition rules over the
  ('dp','fsdp','mp') mesh like TransformerConfig.
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as PS

from lmrl_gym_tpu.models.transformer import KVCache, mask_pad_logits

_NEG = jnp.finfo(jnp.float32).min


@dataclass(frozen=True)
class EncDecConfig:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6  # encoder layers
    num_decoder_layers: Optional[int] = None  # default = num_layers
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    feed_forward_proj: str = "relu"  # 'relu' | 'gated-gelu' (v1.1/flan)
    layer_norm_epsilon: float = 1e-6
    dropout_rate: float = 0.1
    initializer_factor: float = 1.0
    tie_word_embeddings: bool = True  # v1.1/flan: False
    decoder_start_token_id: int = 0
    pad_token_id: int = 0
    pad_vocab_to_multiple: int = 128
    dtype: str = "bfloat16"

    @property
    def n_dec_layers(self) -> int:
        return self.num_decoder_layers or self.num_layers

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv

    @property
    def padded_vocab_size(self) -> int:
        m = self.pad_vocab_to_multiple
        return ((self.vocab_size + m - 1) // m) * m

    def replace(self, **kw) -> "EncDecConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "EncDecConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    def partition_rules(self) -> Tuple[Tuple[str, PS], ...]:
        return (
            ("shared/embedding", PS("mp", "fsdp")),
            ("rel_bias/embedding", PS()),
            ("/(q|k|v)/kernel", PS("fsdp", "mp")),
            ("/o/kernel", PS("mp", "fsdp")),
            ("wi(_0|_1)?/kernel", PS("fsdp", "mp")),
            ("wo/kernel", PS("mp", "fsdp")),
            ("lm_head/kernel", PS("fsdp", "mp")),
            (".*scale", PS()),
            (".*", PS()),
        )


def t5_small() -> EncDecConfig:
    return EncDecConfig()


def t5_base() -> EncDecConfig:
    return EncDecConfig(d_model=768, d_ff=3072, num_heads=12, num_layers=12)


def flan_t5_xl() -> EncDecConfig:
    """flan-t5-xl — the reference oracle architecture
    (twenty_questions/env/oracle.py:20)."""
    return EncDecConfig(
        d_model=2048,
        d_kv=64,
        d_ff=5120,
        num_layers=24,
        num_heads=32,
        feed_forward_proj="gated-gelu",
        tie_word_embeddings=False,
    )


def tiny_encdec_config(**kw) -> EncDecConfig:
    base = dict(
        vocab_size=259,
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=2,
        num_heads=4,
        dropout_rate=0.0,
        pad_vocab_to_multiple=64,
        dtype="float32",
    )
    base.update(kw)
    return EncDecConfig(**base)


def relative_position_bucket(
    relative_position: jax.Array,  # key_pos - query_pos
    bidirectional: bool,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jax.Array:
    """T5's log-spaced relative-position bucketing (semantics of HF
    T5Attention._relative_position_bucket, reimplemented)."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret += (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def compute_position_bias(
    rel_bias_embed: jax.Array,  # [num_buckets, H]
    query_pos: jax.Array,  # [T_q]
    key_pos: jax.Array,  # [T_kv]
    bidirectional: bool,
    num_buckets: int,
    max_distance: int,
) -> jax.Array:
    """→ [1, H, T_q, T_kv] additive attention bias."""
    rp = key_pos[None, :] - query_pos[:, None]  # [T_q, T_kv]
    buckets = relative_position_bucket(rp, bidirectional, num_buckets, max_distance)
    bias = rel_bias_embed[buckets]  # [T_q, T_kv, H]
    return bias.transpose(2, 0, 1)[None].astype(jnp.float32)


class T5Attention(nn.Module):
    """T5 attention: d_kv-wide heads, no bias terms, NO 1/sqrt(d) scaling
    (T5 folds the scale into initialization)."""

    config: EncDecConfig

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(cfg.initializer_factor * (cfg.d_model**-0.5))
        dtype = jnp.dtype(cfg.dtype)
        self.q = nn.Dense(cfg.inner_dim, use_bias=False, dtype=dtype, kernel_init=init)
        self.k = nn.Dense(cfg.inner_dim, use_bias=False, dtype=dtype, kernel_init=init)
        self.v = nn.Dense(cfg.inner_dim, use_bias=False, dtype=dtype, kernel_init=init)
        self.o = nn.Dense(
            cfg.d_model,
            use_bias=False,
            dtype=dtype,
            kernel_init=nn.initializers.normal(cfg.initializer_factor * (cfg.inner_dim**-0.5)),
        )
        self.drop = nn.Dropout(cfg.dropout_rate)

    def _heads(self, t: jax.Array) -> jax.Array:
        B, L, _ = t.shape
        cfg = self.config
        return t.reshape(B, L, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)

    def project_kv(self, kv: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Cross-attention K/V precompute (run once per encoder pass)."""
        return self._heads(self.k(kv)), self._heads(self.v(kv))

    def __call__(
        self,
        x: jax.Array,  # [B, T_q, D] (already normed)
        mask: jax.Array,  # [B|1, 1, T_q, T_kv] bool
        position_bias: Optional[jax.Array],  # [1, H, T_q, T_kv] f32
        layer_cache: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
        static_kv: Optional[Tuple[jax.Array, jax.Array]] = None,  # cross K/V
        deterministic: bool = True,
    ):
        cfg = self.config
        B, T, _ = x.shape
        dtype = jnp.dtype(cfg.dtype)
        q = self._heads(self.q(x))
        if static_kv is not None:
            k, v = static_kv  # [B, H, T_enc, Dh]
            new_cache = None
        else:
            k, v = self._heads(self.k(x)), self._heads(self.v(x))
            if layer_cache is not None:
                ck, cv, index = layer_cache
                ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, index, 0))
                cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, index, 0))
                k, v = ck, cv
                new_cache = (ck, cv)
            else:
                new_cache = None

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        if position_bias is not None:
            scores = scores + position_bias
        scores = jnp.where(mask, scores, _NEG)
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        if not deterministic and cfg.dropout_rate > 0:
            probs = self.drop(probs, deterministic=False)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(dtype))
        out = out.transpose(0, 2, 1, 3).reshape(B, T, cfg.inner_dim)
        return self.o(out), new_cache


class T5MLP(nn.Module):
    config: EncDecConfig

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        wi_init = nn.initializers.normal(cfg.initializer_factor * (cfg.d_model**-0.5))
        wo_init = nn.initializers.normal(cfg.initializer_factor * (cfg.d_ff**-0.5))
        if cfg.feed_forward_proj == "gated-gelu":
            h = nn.gelu(
                nn.Dense(cfg.d_ff, use_bias=False, dtype=dtype, kernel_init=wi_init, name="wi_0")(x),
                approximate=True,
            )
            h = h * nn.Dense(
                cfg.d_ff, use_bias=False, dtype=dtype, kernel_init=wi_init, name="wi_1"
            )(x)
        elif cfg.feed_forward_proj == "relu":
            h = nn.relu(
                nn.Dense(cfg.d_ff, use_bias=False, dtype=dtype, kernel_init=wi_init, name="wi")(x)
            )
        else:
            raise ValueError(cfg.feed_forward_proj)
        if not deterministic and cfg.dropout_rate > 0:
            h = nn.Dropout(cfg.dropout_rate, deterministic=False)(h)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=dtype, kernel_init=wo_init, name="wo")(h)


def _rms(cfg: EncDecConfig):
    # T5LayerNorm == RMSNorm (no mean subtraction, no bias)
    return nn.RMSNorm(epsilon=cfg.layer_norm_epsilon, dtype=jnp.dtype(cfg.dtype))


class T5Block(nn.Module):
    config: EncDecConfig
    is_decoder: bool

    def setup(self):
        cfg = self.config
        self.ln_self = _rms(cfg)
        self.self_attn = T5Attention(cfg)
        if self.is_decoder:
            self.ln_cross = _rms(cfg)
            self.cross_attn = T5Attention(cfg)
        self.ln_mlp = _rms(cfg)
        self.mlp = T5MLP(cfg)
        self.drop = nn.Dropout(cfg.dropout_rate)

    def _res_drop(self, h: jax.Array, deterministic: bool) -> jax.Array:
        if not deterministic and self.config.dropout_rate > 0:
            return self.drop(h, deterministic=False)
        return h

    def __call__(
        self,
        x: jax.Array,
        self_mask: jax.Array,  # [B,1,T_q,T_kv] bool
        position_bias: Optional[jax.Array],
        cross_mask: Optional[jax.Array] = None,  # [B,1,T_q,T_enc] bool
        cross_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
        layer_cache: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
        deterministic: bool = True,
    ):
        h, new_cache = self.self_attn(
            self.ln_self(x), self_mask, position_bias, layer_cache, None, deterministic
        )
        x = x + self._res_drop(h, deterministic)
        if self.is_decoder:
            h, _ = self.cross_attn(
                self.ln_cross(x), cross_mask, None, None, cross_kv, deterministic
            )
            x = x + self._res_drop(h, deterministic)
        h = self.mlp(self.ln_mlp(x), deterministic)
        return x + self._res_drop(h, deterministic), new_cache


class EncoderDecoder(nn.Module):
    """T5. Methods: __call__ (full enc+dec forward for training/scoring),
    encode, precompute_cross, decode_step (cached autoregressive step)."""

    config: EncDecConfig

    def setup(self):
        cfg = self.config
        self.shared = nn.Embed(
            cfg.padded_vocab_size,
            cfg.d_model,
            embedding_init=nn.initializers.normal(cfg.initializer_factor * 1.0),
            dtype=jnp.dtype(cfg.dtype),
        )
        bias_init = nn.initializers.normal(cfg.initializer_factor * (cfg.d_model**-0.5))
        self.enc_rel_bias = nn.Embed(
            cfg.relative_attention_num_buckets, cfg.num_heads, embedding_init=bias_init
        )
        self.dec_rel_bias = nn.Embed(
            cfg.relative_attention_num_buckets, cfg.num_heads, embedding_init=bias_init
        )
        self.enc_blocks = [
            T5Block(cfg, is_decoder=False) for _ in range(cfg.num_layers)
        ]
        self.dec_blocks = [
            T5Block(cfg, is_decoder=True) for _ in range(cfg.n_dec_layers)
        ]
        self.enc_ln_f = _rms(cfg)
        self.dec_ln_f = _rms(cfg)
        self.drop = nn.Dropout(cfg.dropout_rate)
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(
                cfg.padded_vocab_size,
                use_bias=False,
                dtype=jnp.float32,
                kernel_init=nn.initializers.normal(cfg.initializer_factor * 1.0),
            )

    def _res_drop(self, h: jax.Array, deterministic: bool) -> jax.Array:
        if not deterministic and self.config.dropout_rate > 0:
            return self.drop(h, deterministic=False)
        return h

    def _bias(self, which: str, query_pos, key_pos):
        cfg = self.config
        embed = (self.enc_rel_bias if which == "enc" else self.dec_rel_bias).embedding
        return compute_position_bias(
            embed,
            query_pos,
            key_pos,
            bidirectional=(which == "enc"),
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance,
        )

    def encode(self, input_ids: jax.Array, attention_mask: jax.Array, deterministic: bool = True):
        B, T = input_ids.shape
        x = self._res_drop(self.shared(input_ids), deterministic)
        pos = jnp.arange(T)
        bias = self._bias("enc", pos, pos)
        mask = attention_mask[:, None, None, :] > 0  # [B,1,1,T] broadcasts over T_q
        for blk in self.enc_blocks:
            x, _ = blk(x, mask, bias, deterministic=deterministic)
        return self._res_drop(self.enc_ln_f(x), deterministic)

    def precompute_cross(self, enc_hidden: jax.Array):
        """→ (cross_k, cross_v) each [L_dec, B, H, T_enc, Dh]."""
        ks, vs = [], []
        for blk in self.dec_blocks:
            k, v = blk.cross_attn.project_kv(enc_hidden)
            ks.append(k)
            vs.append(v)
        return jnp.stack(ks), jnp.stack(vs)

    def _decode(
        self,
        decoder_input_ids: jax.Array,  # [B, T]
        decoder_attention_mask: jax.Array,  # [B, T_kv] (cache len if cached)
        enc_mask: jax.Array,  # [B, T_enc]
        cross_k: jax.Array,
        cross_v: jax.Array,
        cache: Optional[KVCache],
        deterministic: bool,
    ):
        cfg = self.config
        B, T = decoder_input_ids.shape
        x = self._res_drop(self.shared(decoder_input_ids), deterministic)

        if cache is not None:
            T_kv = cache.max_len
            q_pos = cache.index + jnp.arange(T)
            kv_pos = jnp.arange(T_kv)
            causal = kv_pos[None, None, None, :] <= q_pos[None, None, :, None]
        else:
            q_pos = jnp.arange(T)
            kv_pos = q_pos
            causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
        self_mask = causal & (decoder_attention_mask[:, None, None, :] > 0)
        bias = self._bias("dec", q_pos, kv_pos)
        cross_mask = jnp.broadcast_to(
            enc_mask[:, None, None, :] > 0, (B, 1, T, enc_mask.shape[1])
        )

        new_k, new_v = [], []
        for i, blk in enumerate(self.dec_blocks):
            layer_cache = (cache.k[i], cache.v[i], cache.index) if cache is not None else None
            x, lc = blk(
                x,
                self_mask,
                bias,
                cross_mask=cross_mask,
                cross_kv=(cross_k[i], cross_v[i]),
                layer_cache=layer_cache,
                deterministic=deterministic,
            )
            if lc is not None:
                new_k.append(lc[0])
                new_v.append(lc[1])

        x = self._res_drop(self.dec_ln_f(x), deterministic)
        if cfg.tie_word_embeddings:
            # T5 scales tied-head inputs by d_model^-0.5
            logits = self.shared.attend((x * (cfg.d_model**-0.5)).astype(jnp.float32))
            logits = logits.astype(jnp.float32)
        else:
            logits = self.lm_head(x.astype(jnp.float32))
        new_cache = None
        if cache is not None:
            new_cache = KVCache(k=tuple(new_k), v=tuple(new_v), index=cache.index + T)
        return logits, x, new_cache

    def decode_step(
        self,
        decoder_input_ids: jax.Array,
        decoder_attention_mask: jax.Array,
        enc_mask: jax.Array,
        cross_k: jax.Array,
        cross_v: jax.Array,
        cache: KVCache,
    ):
        logits, _, new_cache = self._decode(
            decoder_input_ids, decoder_attention_mask, enc_mask,
            cross_k, cross_v, cache, deterministic=True,
        )
        return logits, new_cache

    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        decoder_input_ids: jax.Array,
        decoder_attention_mask: jax.Array,
        deterministic: bool = True,
    ):
        """Full forward → (logits [B,T_dec,V_padded] f32, dec hidden)."""
        enc_hidden = self.encode(input_ids, attention_mask, deterministic)
        cross_k, cross_v = self.precompute_cross(enc_hidden)
        logits, hidden, _ = self._decode(
            decoder_input_ids, decoder_attention_mask, attention_mask,
            cross_k, cross_v, None, deterministic,
        )
        return logits, hidden


def init_encdec_params(config: EncDecConfig, key: jax.Array, batch: int = 1, seq: int = 8):
    model = EncoderDecoder(config)
    ids = jnp.zeros((batch, seq), jnp.int32)
    mask = jnp.ones((batch, seq), jnp.int32)
    variables = model.init(key, ids, mask, ids, mask)
    return variables["params"]


class EncDecCore:
    """Stateless (config, module) bundle mirroring interface.LMCore."""

    def __init__(self, config: EncDecConfig):
        self.config = config
        self.module = EncoderDecoder(config)

    def forward(
        self,
        params: Any,
        input_ids: jax.Array,
        decoder_input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        decoder_attention_mask: Optional[jax.Array] = None,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        if attention_mask is None:
            attention_mask = (input_ids != self.config.pad_token_id).astype(jnp.int32)
        if decoder_attention_mask is None:
            decoder_attention_mask = jnp.ones_like(decoder_input_ids, jnp.int32)
        rngs = {"dropout": rng} if (train and rng is not None) else {}
        logits, hidden = self.module.apply(
            {"params": params},
            input_ids,
            attention_mask,
            decoder_input_ids,
            decoder_attention_mask,
            deterministic=not train,
            rngs=rngs,
        )
        return logits, hidden

    def make_seq2seq_logits_fn(
        self,
        params: Any,
        enc_ids: jax.Array,  # [B, T_enc]
        enc_mask: jax.Array,  # [B, T_enc]
        total_dec_len: int,
    ):
        """(logits_fn, init_carry) for models.generation.generate: runs the
        encoder + cross-KV precompute once; the scan steps only the decoder."""
        cfg = self.config
        B = enc_ids.shape[0]
        enc_hidden = self.module.apply(
            {"params": params}, enc_ids, enc_mask, method=EncoderDecoder.encode
        )
        cross_k, cross_v = self.module.apply(
            {"params": params}, enc_hidden, method=EncoderDecoder.precompute_cross
        )
        # decoder self-attn KV cache: d_kv-wide heads, one buffer per
        # decoder layer (see transformer.KVCache on why not stacked)
        shape = (B, cfg.num_heads, total_dec_len, cfg.d_kv)
        dtype = jnp.dtype(cfg.dtype)
        cache = KVCache(
            k=tuple(jnp.zeros(shape, dtype) for _ in range(cfg.n_dec_layers)),
            v=tuple(jnp.zeros(shape, dtype) for _ in range(cfg.n_dec_layers)),
            index=jnp.zeros((), jnp.int32),
        )

        def logits_fn(tokens: jax.Array, attn_mask: jax.Array, carry):
            cache = carry
            cache_len = cache.max_len
            if attn_mask.shape[1] < cache_len:
                attn_mask = jnp.pad(attn_mask, ((0, 0), (0, cache_len - attn_mask.shape[1])))
            logits, cache = self.module.apply(
                {"params": params},
                tokens,
                attn_mask,
                enc_mask,
                cross_k,
                cross_v,
                cache,
                method=EncoderDecoder.decode_step,
            )
            return mask_pad_logits(logits, cfg.vocab_size), cache

        return logits_fn, cache
