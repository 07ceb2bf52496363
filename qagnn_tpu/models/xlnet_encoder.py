"""TPU-native XLNet text encoder (content stream, fine-tuning path).

Replaces the reference's XLNet branch of the HF-torch TextEncoder facade
(reference modeling/modeling_encoder.py:28,135-136: model_type 'xlnet' feeds
(input_ids, attention_mask, token_type_ids, output_mask) and pools
hidden[layer_id][:, -1] — the CLS token sits at the END because the XLNet
statement tensorization left-pads, reference utils/data_utils.py:283-430).

Implemented from scratch in flax for XLA. Scope: the inference/fine-tuning
configuration the reference uses — attn_type="bi", no memory (mems), no
permutation masks, no two-stream g path, bi_data=False. The scope limit is
enforced, not just documented: `__call__` accepts no mems/perm_mask/
target_mapping arguments (passing them raises TypeError), and
`xlnet_config_from_hf` asserts attn_type == "bi" and bi_data == False when
converting a checkpoint. Semantics match HF XLNetModel under those settings
exactly:

  * Transformer-XL relative attention: content score ac (q + r_w_bias) . k,
    position score bd (q + r_r_bias) . k_r with the rel-shift trick over a
    2L-long sinusoid table (positions klen..-qlen), segment score ef
    (q + r_s_bias) . seg_embed gathered through the binary same/diff-segment
    matrix — NOT learned absolute positions.
  * padding masked with -1e30 additive, except self positions (the non_tgt
    eye carve-out), exactly HF's (attn_mask + -eye > 0) construction.
  * post-LN residual blocks; FFN with exact (erf) GELU.

All parameters are stored in HF's native shapes ((d_model, n_head, d_head)
projection tensors) so checkpoint conversion is a copy, not a reshape.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclass(frozen=True)
class XLNetConfig:
    vocab_size: int = 32000
    hidden_size: int = 768       # d_model
    num_layers: int = 12
    num_heads: int = 12
    d_head: int = 64
    d_inner: int = 3072
    layer_norm_eps: float = 1e-12
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def xlnet_large(cls, **kw):
        return cls(hidden_size=1024, num_layers=24, num_heads=16,
                   d_head=64, d_inner=4096, **kw)

    @classmethod
    def tiny(cls, **kw):
        kw.setdefault("vocab_size", 97)
        kw.setdefault("hidden_size", 32)
        kw.setdefault("num_layers", 2)
        kw.setdefault("num_heads", 2)
        kw.setdefault("d_head", 16)
        kw.setdefault("d_inner", 64)
        return cls(**kw)


def _rel_shift(bd: Array, klen: int) -> Array:
    """HF rel_shift_bnij: (B, H, L, 2L) -> (B, H, L, klen)."""
    B, H, L, P = bd.shape
    x = bd.reshape(B, H, P, L)[:, :, 1:, :]
    x = x.reshape(B, H, L, P - 1)
    return x[:, :, :, :klen]


class XLNetRelativeAttention(nn.Module):
    cfg: XLNetConfig

    @nn.compact
    def __call__(self, h: Array, pos_emb: Array, seg_mat: Array | None,
                 attn_mask: Array | None, *, train: bool) -> Array:
        cfg = self.cfg
        d, nh, dh = cfg.hidden_size, cfg.num_heads, cfg.d_head
        B, L, _ = h.shape
        scale = 1.0 / np.sqrt(dh)
        init = nn.initializers.normal(0.02)

        def proj(name):
            return self.param(name, init, (d, nh, dh), jnp.float32)

        q_w, k_w, v_w, o_w, r_w = (proj(n) for n in "qkvor")
        r_r = self.param("r_r_bias", init, (nh, dh), jnp.float32)
        r_s = self.param("r_s_bias", init, (nh, dh), jnp.float32)
        r_ww = self.param("r_w_bias", init, (nh, dh), jnp.float32)
        seg_embed = self.param("seg_embed", init, (2, nh, dh), jnp.float32)

        cdt = cfg.dtype
        hc = h.astype(cdt)
        q = jnp.einsum("bih,hnd->bind", hc, q_w.astype(cdt))
        k = jnp.einsum("bih,hnd->bind", hc, k_w.astype(cdt))
        v = jnp.einsum("bih,hnd->bind", hc, v_w.astype(cdt))
        k_r = jnp.einsum("ph,hnd->pnd", pos_emb.astype(cdt), r_w.astype(cdt))

        f32 = jnp.float32
        ac = jnp.einsum("bind,bjnd->bnij", q + r_ww.astype(cdt), k,
                        preferred_element_type=f32)
        bd = jnp.einsum("bind,pnd->bnip", q + r_r.astype(cdt), k_r,
                        preferred_element_type=f32)
        bd = _rel_shift(bd, klen=L)
        if seg_mat is None:
            ef = 0.0
        else:
            ef = jnp.einsum("bind,snd->bnis", q + r_s.astype(cdt),
                            seg_embed.astype(cdt), preferred_element_type=f32)
            ef = jnp.einsum("bijs,bnis->bnij", seg_mat.astype(f32), ef)

        attn_score = (ac + bd + ef) * scale
        if attn_mask is not None:
            attn_score = attn_score - 1e30 * attn_mask[:, None]  # (B,1,L,L)

        attn_prob = jax.nn.softmax(attn_score, axis=-1).astype(cdt)
        attn_prob = nn.Dropout(cfg.dropout, deterministic=not train)(attn_prob)
        attn_vec = jnp.einsum("bnij,bjnd->bind", attn_prob, v)
        attn_out = jnp.einsum("bind,hnd->bih", attn_vec, o_w.astype(cdt))
        attn_out = nn.Dropout(cfg.dropout, deterministic=not train)(attn_out)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                            use_fast_variance=False,
                            name="layer_norm")(attn_out + h)


class XLNetLayer(nn.Module):
    cfg: XLNetConfig

    @nn.compact
    def __call__(self, h, pos_emb, seg_mat, attn_mask, *, train: bool):
        cfg = self.cfg
        h = XLNetRelativeAttention(cfg, name="rel_attn")(
            h, pos_emb, seg_mat, attn_mask, train=train)
        f = nn.Dense(cfg.d_inner, dtype=cfg.dtype, name="ff_layer_1")(h)
        f = jax.nn.gelu(f, approximate=False)   # HF ACT2FN['gelu'] is exact
        f = nn.Dropout(cfg.dropout, deterministic=not train)(f)
        f = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="ff_layer_2")(f)
        f = nn.Dropout(cfg.dropout, deterministic=not train)(f)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                            use_fast_variance=False, name="ff_layer_norm")(
            f + h)


class XLNetTextEncoder(nn.Module):
    """XLNet encoder with the reference's last-position pooling contract."""

    cfg: XLNetConfig

    @nn.compact
    def __call__(self, input_ids: Array, attention_mask: Array,
                 token_type_ids: Array | None = None,
                 special_tokens_mask: Array | None = None,
                 *, layer_id: int = -1, train: bool = False,
                 return_all_hidden: bool = False):
        del special_tokens_mask
        cfg = self.cfg
        B, L = input_ids.shape

        # padding mask with the self-position carve-out:
        # mask[b, i, j] = 1 iff token j is padding and i != j
        pad_j = (attention_mask == 0).astype(jnp.float32)        # (B, L)
        eye = jnp.eye(L, dtype=jnp.float32)
        attn_mask = ((pad_j[:, None, :] - eye[None]) > 0).astype(jnp.float32)

        # binary same/diff segment matrix, one-hot over 2 classes
        seg_mat = None
        if token_type_ids is not None:
            diff = (token_type_ids[:, :, None]
                    != token_type_ids[:, None, :]).astype(jnp.int32)
            seg_mat = jax.nn.one_hot(diff, 2, dtype=jnp.float32)  # (B,L,L,2)

        # relative sinusoid table for positions klen .. -qlen (length 2L)
        d = cfg.hidden_size
        freq = jnp.arange(0, d, 2, dtype=jnp.float32)
        inv_freq = 1.0 / jnp.power(10000.0, freq / d)
        pos_seq = jnp.arange(L, -L, -1, dtype=jnp.float32)        # (2L,)
        sin_inp = pos_seq[:, None] * inv_freq[None, :]
        pos_emb = jnp.concatenate([jnp.sin(sin_inp), jnp.cos(sin_inp)],
                                  axis=-1)                        # (2L, d)
        pos_emb = nn.Dropout(cfg.dropout, deterministic=not train)(pos_emb)

        we = nn.Embed(cfg.vocab_size, d, dtype=cfg.dtype,
                      name="word_embedding")(input_ids)
        h = nn.Dropout(cfg.dropout, deterministic=not train)(we)

        all_hidden = [h]
        for i in range(cfg.num_layers):
            h = XLNetLayer(cfg, name=f"layer_{i}")(
                h, pos_emb, seg_mat, attn_mask, train=train)
            all_hidden.append(h)

        chosen = all_hidden[layer_id]
        # CLS is the LAST position (left-padded input,
        # reference modeling/modeling_encoder.py:135-136)
        pooled = chosen[:, -1]

        if return_all_hidden:
            return pooled, tuple(all_hidden)
        return pooled


def convert_hf_xlnet_params(state_dict: dict) -> dict:
    """Map an HF XLNetModel state_dict to this module's param tree.

    Projection tensors (q/k/v/o/r, seg_embed, biases) are stored in HF's
    native shapes — straight copies. FFN Linears transpose as usual.
    """

    def a(t):
        t = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        return jnp.asarray(t)

    def dense(prefix):
        return {"kernel": a(state_dict[prefix + ".weight"]).T,
                "bias": a(state_dict[prefix + ".bias"])}

    def ln(prefix):
        return {"scale": a(state_dict[prefix + ".weight"]),
                "bias": a(state_dict[prefix + ".bias"])}

    p = {"word_embedding": {"embedding": a(state_dict[
        "word_embedding.weight"])}}
    i = 0
    while f"layer.{i}.rel_attn.q" in state_dict:
        base = f"layer.{i}"
        p[f"layer_{i}"] = {
            "rel_attn": {
                **{n: a(state_dict[f"{base}.rel_attn.{n}"])
                   for n in ("q", "k", "v", "o", "r", "r_r_bias", "r_s_bias",
                             "r_w_bias", "seg_embed")},
                "layer_norm": ln(base + ".rel_attn.layer_norm"),
            },
            "ff_layer_1": dense(base + ".ff.layer_1"),
            "ff_layer_2": dense(base + ".ff.layer_2"),
            "ff_layer_norm": ln(base + ".ff.layer_norm"),
        }
        i += 1
    return p


def xlnet_config_from_hf(hf_config, dtype=jnp.float32) -> XLNetConfig:
    assert hf_config.attn_type == "bi", "only attn_type='bi' supported"
    assert not hf_config.bi_data, "bi_data not supported"
    return XLNetConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.d_model,
        num_layers=hf_config.n_layer,
        num_heads=hf_config.n_head,
        d_head=hf_config.d_head,
        d_inner=hf_config.d_inner,
        layer_norm_eps=hf_config.layer_norm_eps,
        dropout=hf_config.dropout,
        dtype=dtype,
    )
