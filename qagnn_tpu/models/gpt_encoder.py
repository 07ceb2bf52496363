"""TPU-native GPT (OpenAI GPT-1) text encoder.

Replaces the reference's GPT branch of the HF-torch TextEncoder facade
(reference modeling/modeling_encoder.py:28,89-143: model_type 'gpt' feeds
(input_ids, cls_token_ids, lm_labels) and pools the hidden state AT the
classification-token position via gather). Implemented from scratch in flax:

  * decoder-only transformer, learned positions, causal mask
  * post-LN block layout: n = LN(x + Attn(x)); h = LN(n + MLP(n))
  * the causal mask uses the historical -1e4 additive constant (not -inf) so
    converted checkpoints reproduce HF OpenAIGPTModel numerics exactly
  * tanh-approx GELU (the afn="gelu" table maps to gelu_new in HF)
  * pooled vector = hidden[layer_id] gathered at cls_token_ids — the
    _classify_ token appended by the GPT statement tensorization
    (reference utils/data_utils.py:203-281)

Weights convert from HF torch OpenAIGPTModel state dicts; HF's Conv1D stores
kernels as (in, out), which is already flax's Dense layout (no transpose).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclass(frozen=True)
class GPTConfig:
    vocab_size: int = 40481     # 40478 BPE + 3 special tokens (_start_ etc.)
    n_positions: int = 512
    hidden_size: int = 768      # n_embd
    num_layers: int = 12
    num_heads: int = 12
    layer_norm_eps: float = 1e-5
    embd_dropout: float = 0.1
    attn_dropout: float = 0.1
    resid_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def openai_gpt(cls, **kw):
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw):
        kw.setdefault("vocab_size", 97)
        kw.setdefault("n_positions", 40)
        kw.setdefault("hidden_size", 32)
        kw.setdefault("num_layers", 2)
        kw.setdefault("num_heads", 2)
        return cls(**kw)


class GPTBlock(nn.Module):
    cfg: GPTConfig

    @nn.compact
    def __call__(self, x: Array, causal_bias: Array, *, train: bool) -> Array:
        cfg = self.cfg
        d, nh = cfg.hidden_size, cfg.num_heads
        dh = d // nh
        B, L, _ = x.shape

        qkv = nn.Dense(3 * d, dtype=cfg.dtype, name="c_attn")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, nh, dh)
        k = k.reshape(B, L, nh, dh)
        v = v.reshape(B, L, nh, dh)

        w = jnp.einsum("blhd,bmhd->bhlm", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(dh)
        # HF OpenAIGPT masks with w*tril + -1e4*(1-tril) AFTER scaling —
        # reproduced exactly (the -1e4 leaks a softmax-epsilon of future
        # positions; parity demands it).
        w = w * causal_bias + (-1e4) * (1.0 - causal_bias)
        w = jax.nn.softmax(w, axis=-1).astype(cfg.dtype)
        w = nn.Dropout(cfg.attn_dropout, deterministic=not train)(w)
        a = jnp.einsum("bhlm,bmhd->blhd", w, v).reshape(B, L, d)
        a = nn.Dense(d, dtype=cfg.dtype, name="c_proj")(a)
        a = nn.Dropout(cfg.resid_dropout, deterministic=not train)(a)

        n = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         use_fast_variance=False, name="ln_1")(x + a)

        m = nn.Dense(4 * d, dtype=cfg.dtype, name="mlp_fc")(n)
        m = jax.nn.gelu(m, approximate=True)   # ACT_FNS['gelu'] == gelu_new
        m = nn.Dense(d, dtype=cfg.dtype, name="mlp_proj")(m)
        m = nn.Dropout(cfg.resid_dropout, deterministic=not train)(m)

        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                            use_fast_variance=False, name="ln_2")(n + m)


class GPTTextEncoder(nn.Module):
    """GPT encoder with the reference's cls-token-gather pooling contract.

    Call with the GPT statement-tensorization inputs: input_ids (B, L),
    cls_token_ids (B,) — position of the final _classify_ token — and the
    (unused, interface-parity) lm_labels (reference
    modeling/modeling_encoder.py:119-121,131-133).
    """

    cfg: GPTConfig

    @nn.compact
    def __call__(self, input_ids: Array, cls_token_ids: Array,
                 lm_labels: Array | None = None, *, layer_id: int = -1,
                 train: bool = False, return_all_hidden: bool = False):
        del lm_labels
        cfg = self.cfg
        B, L = input_ids.shape

        position_ids = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
        we = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                      name="tokens_embed")(input_ids)
        pe = nn.Embed(cfg.n_positions, cfg.hidden_size, dtype=cfg.dtype,
                      name="positions_embed")(position_ids)
        h = nn.Dropout(cfg.embd_dropout, deterministic=not train)(we + pe)

        causal = jnp.tril(jnp.ones((L, L), jnp.float32))[None, None]

        all_hidden = [h]
        for i in range(cfg.num_layers):
            h = GPTBlock(cfg, name=f"block_{i}")(h, causal, train=train)
            all_hidden.append(h)

        chosen = all_hidden[layer_id]
        # gather hidden state at the classification-token position
        # (reference modeling/modeling_encoder.py:131-133)
        pooled = jnp.take_along_axis(
            chosen, cls_token_ids.reshape(B, 1, 1).astype(jnp.int32),
            axis=1)[:, 0]

        if return_all_hidden:
            return pooled, tuple(all_hidden)
        return pooled


def convert_hf_gpt_params(state_dict: dict) -> dict:
    """Map an HF OpenAIGPTModel state_dict to this module's param tree.

    HF Conv1D weights are (in, out) — flax Dense layout — so attention/MLP
    kernels copy straight through (unlike nn.Linear, which transposes).
    """

    def a(t):
        t = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        return jnp.asarray(t)

    def conv1d(prefix):
        return {"kernel": a(state_dict[prefix + ".weight"]),
                "bias": a(state_dict[prefix + ".bias"])}

    def ln(prefix):
        return {"scale": a(state_dict[prefix + ".weight"]),
                "bias": a(state_dict[prefix + ".bias"])}

    p = {
        "tokens_embed": {"embedding": a(state_dict["tokens_embed.weight"])},
        "positions_embed": {"embedding": a(
            state_dict["positions_embed.weight"])},
    }
    i = 0
    while f"h.{i}.attn.c_attn.weight" in state_dict:
        p[f"block_{i}"] = {
            "c_attn": conv1d(f"h.{i}.attn.c_attn"),
            "c_proj": conv1d(f"h.{i}.attn.c_proj"),
            "ln_1": ln(f"h.{i}.ln_1"),
            "mlp_fc": conv1d(f"h.{i}.mlp.c_fc"),
            "mlp_proj": conv1d(f"h.{i}.mlp.c_proj"),
            "ln_2": ln(f"h.{i}.ln_2"),
        }
        i += 1
    return p


def gpt_config_from_hf(hf_config, dtype=jnp.float32) -> GPTConfig:
    return GPTConfig(
        vocab_size=hf_config.vocab_size,
        n_positions=hf_config.n_positions,
        hidden_size=hf_config.n_embd,
        num_layers=hf_config.n_layer,
        num_heads=hf_config.n_head,
        embd_dropout=hf_config.embd_pdrop,
        attn_dropout=hf_config.attn_pdrop,
        resid_dropout=hf_config.resid_pdrop,
        dtype=dtype,
    )
