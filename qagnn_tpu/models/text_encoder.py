"""TPU-native transformer text encoder (BERT / RoBERTa / SapBERT family).

Replaces the reference's HF-torch TextEncoder facade
(reference modeling/modeling_encoder.py:89-143): same contract —
forward(input_ids, attention_mask, token_type_ids) returns the pooled sentence
vector of a selectable hidden layer (pooler = tanh(W h[layer_id][:, 0]),
reference modeling/modeling_encoder.py:126,142) plus all hidden states — but
implemented from scratch in flax for XLA:

  * one fused program: embeddings + L transformer blocks + pooler
  * bf16 compute / fp32 params via the `dtype` field (replaces torch.cuda.amp,
    reference qagnn.py:232-234)
  * static shapes, additive attention mask, fp32 softmax accumulation
  * weights come from HF torch checkpoints via convert_hf_encoder_params()

RoBERTa vs BERT differences handled: position ids offset past the padding idx
and derived from the attention mask (RoBERTa), type vocab of 1 vs 2.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclass(frozen=True)
class TextEncoderConfig:
    vocab_size: int
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    pad_token_id: int = 0
    # RoBERTa numbers position ids starting at pad_token_id + 1 and derives
    # them from the attention mask; BERT counts from 0 unconditionally.
    roberta_style_positions: bool = False
    # ALBERT: factorized embedding (embed at embedding_size, project to
    # hidden), one transformer block shared across all layers, tanh-approx
    # gelu, and the reference pools raw h[:, 0] with no pooler dense
    # (reference modeling/modeling_encoder.py:138-140).
    embedding_size: int | None = None
    share_layers: bool = False
    hidden_act: str = "gelu"         # "gelu" (exact, BERT) | "gelu_new" (tanh)
    raw_cls_pool: bool = False
    dtype: jnp.dtype = jnp.float32   # compute dtype (bf16 on TPU)

    @classmethod
    def roberta_base(cls, **kw):
        return cls(vocab_size=50265, hidden_size=768, num_layers=12,
                   num_heads=12, intermediate_size=3072,
                   max_position_embeddings=514, type_vocab_size=1,
                   layer_norm_eps=1e-5, pad_token_id=1,
                   roberta_style_positions=True, **kw)

    @classmethod
    def roberta_large(cls, **kw):
        return cls(vocab_size=50265, hidden_size=1024, num_layers=24,
                   num_heads=16, intermediate_size=4096,
                   max_position_embeddings=514, type_vocab_size=1,
                   layer_norm_eps=1e-5, pad_token_id=1,
                   roberta_style_positions=True, **kw)

    @classmethod
    def bert_base(cls, **kw):
        """Also SapBERT (PubMedBERT-fulltext architecture)."""
        return cls(vocab_size=30522, **kw)

    @classmethod
    def albert_base(cls, **kw):
        # ALBERT v2 checkpoints (vocab 30000, gelu_new) train with ZERO
        # dropout — inheriting the class default 0.1 would silently diverge
        # from the HF/reference fine-tuning setup.
        kw.setdefault("hidden_dropout", 0.0)
        kw.setdefault("attention_dropout", 0.0)
        return cls(vocab_size=30000, hidden_size=768, num_layers=12,
                   num_heads=12, intermediate_size=3072,
                   embedding_size=128, share_layers=True,
                   hidden_act="gelu_new", raw_cls_pool=True, **kw)

    @classmethod
    def albert_xxlarge(cls, **kw):
        kw.setdefault("hidden_dropout", 0.0)
        kw.setdefault("attention_dropout", 0.0)
        return cls(vocab_size=30000, hidden_size=4096, num_layers=12,
                   num_heads=64, intermediate_size=16384,
                   embedding_size=128, share_layers=True,
                   hidden_act="gelu_new", raw_cls_pool=True, **kw)

    @classmethod
    def tiny(cls, **kw):
        """For tests and CPU smoke runs."""
        kw.setdefault("vocab_size", 128)
        kw.setdefault("hidden_size", 32)
        kw.setdefault("num_layers", 2)
        kw.setdefault("num_heads", 2)
        kw.setdefault("intermediate_size", 64)
        kw.setdefault("max_position_embeddings", 64)
        return cls(**kw)


class SelfAttention(nn.Module):
    cfg: TextEncoderConfig

    @nn.compact
    def __call__(self, h: Array, attn_bias: Array, *, train: bool) -> Array:
        cfg = self.cfg
        d, nh = cfg.hidden_size, cfg.num_heads
        dh = d // nh
        B, L, _ = h.shape

        q = nn.Dense(d, dtype=cfg.dtype, name="query")(h)
        k = nn.Dense(d, dtype=cfg.dtype, name="key")(h)
        v = nn.Dense(d, dtype=cfg.dtype, name="value")(h)
        q = q.reshape(B, L, nh, dh)
        k = k.reshape(B, L, nh, dh)
        v = v.reshape(B, L, nh, dh)

        # fp32 logits/softmax regardless of compute dtype
        scores = jnp.einsum("blhd,bmhd->bhlm", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(dh) + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        probs = nn.Dropout(cfg.attention_dropout,
                           deterministic=not train)(probs)
        ctx = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(B, L, d)
        return nn.Dense(d, dtype=cfg.dtype, name="out")(ctx)


class TransformerBlock(nn.Module):
    """Post-LN BERT block: h = LN(h + Attn(h)); h = LN(h + FFN(h))."""
    cfg: TextEncoderConfig

    @nn.compact
    def __call__(self, h: Array, attn_bias: Array, *, train: bool) -> Array:
        cfg = self.cfg
        a = SelfAttention(cfg, name="attention")(h, attn_bias, train=train)
        a = nn.Dropout(cfg.hidden_dropout, deterministic=not train)(a)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         use_fast_variance=False,
                         name="attention_ln")(h + a)
        f = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                     name="intermediate")(h)
        # HF BERT uses exact gelu; ALBERT/GPT use the tanh approximation
        f = jax.nn.gelu(f, approximate=(cfg.hidden_act == "gelu_new"))
        f = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="output")(f)
        f = nn.Dropout(cfg.hidden_dropout, deterministic=not train)(f)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         use_fast_variance=False,
                            name="output_ln")(h + f)


class TextEncoder(nn.Module):
    """BERT/RoBERTa encoder with the reference's pooled-output contract."""

    cfg: TextEncoderConfig

    @nn.compact
    def __call__(self, input_ids: Array, attention_mask: Array,
                 token_type_ids: Array | None = None,
                 special_tokens_mask: Array | None = None,
                 *, layer_id: int = -1, train: bool = False,
                 return_all_hidden: bool = False):
        """input_ids/attention_mask: (B, L). Returns pooled (B, hidden)
        [, tuple of all hidden states]. `special_tokens_mask` (the reference's
        output_mask) is accepted for interface parity and unused here."""
        del special_tokens_mask
        cfg = self.cfg
        B, L = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        if cfg.roberta_style_positions:
            # HF create_position_ids_from_input_ids: pad positions keep
            # padding_idx; real tokens count from padding_idx + 1.
            mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
            position_ids = jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id
        else:
            position_ids = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))

        emb_dim = cfg.embedding_size or cfg.hidden_size
        we = nn.Embed(cfg.vocab_size, emb_dim, dtype=cfg.dtype,
                      name="word_embeddings")(input_ids)
        pe = nn.Embed(cfg.max_position_embeddings, emb_dim,
                      dtype=cfg.dtype, name="position_embeddings")(position_ids)
        te = nn.Embed(max(cfg.type_vocab_size, 1), emb_dim,
                      dtype=cfg.dtype, name="token_type_embeddings")(
            jnp.clip(token_type_ids, 0, max(cfg.type_vocab_size, 1) - 1))
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         use_fast_variance=False,
                         name="embeddings_ln")(we + pe + te)
        h = nn.Dropout(cfg.hidden_dropout, deterministic=not train)(h)
        if emb_dim != cfg.hidden_size:   # ALBERT factorized embedding
            h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                         name="embedding_projection")(h)

        attn_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                              jnp.float32(-1e9))  # (B, 1, 1, L)

        all_hidden = [h]
        shared = (TransformerBlock(cfg, name="layer_shared")
                  if cfg.share_layers else None)
        for i in range(cfg.num_layers):
            block = shared if shared is not None \
                else TransformerBlock(cfg, name=f"layer_{i}")
            h = block(h, attn_bias, train=train)
            all_hidden.append(h)

        # Selectable-layer pooler (reference modeling/modeling_encoder.py:126,142)
        chosen = all_hidden[layer_id]
        if cfg.raw_cls_pool:   # ALBERT branch: raw h[:, 0], no pooler dense
            pooled = chosen[:, 0]
        else:
            pooled = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                              name="pooler")(chosen[:, 0])
            pooled = jnp.tanh(pooled)

        if return_all_hidden:
            return pooled, tuple(all_hidden)
        return pooled


# --------------------------------------------------------------------------
# HF torch checkpoint conversion
# --------------------------------------------------------------------------

def convert_hf_encoder_params(state_dict: dict) -> dict:
    """Map an HF BertModel/RobertaModel state_dict (torch tensors or numpy)
    to this encoder's param tree. Linear kernels are transposed
    (torch stores (out, in); flax uses (in, out))."""

    def a(t):
        t = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        return jnp.asarray(t)

    def find(*names):
        for n in names:
            if n in state_dict:
                return state_dict[n]
        raise KeyError(f"none of {names} in checkpoint")

    def dense(prefix):
        return {"kernel": a(find(prefix + ".weight")).T,
                "bias": a(find(prefix + ".bias"))}

    def ln(prefix):
        return {"scale": a(find(prefix + ".weight")),
                "bias": a(find(prefix + ".bias"))}

    p = {
        "word_embeddings": {"embedding": a(find(
            "embeddings.word_embeddings.weight"))},
        "position_embeddings": {"embedding": a(find(
            "embeddings.position_embeddings.weight"))},
        "token_type_embeddings": {"embedding": a(find(
            "embeddings.token_type_embeddings.weight"))},
        "embeddings_ln": ln("embeddings.LayerNorm"),
    }
    # MLM-style checkpoints (e.g. hub roberta-large) ship no pooler; leaving
    # the key out keeps the freshly initialized pooler on merge — the same
    # behavior as HF AutoModel.from_pretrained (random pooler + warning),
    # which is what the reference trains from
    # (reference modeling/modeling_encoder.py:102-108).
    if "pooler.dense.weight" in state_dict:
        p["pooler"] = dense("pooler.dense")
    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in state_dict:
        base = f"encoder.layer.{i}"
        p[f"layer_{i}"] = {
            "attention": {
                "query": dense(base + ".attention.self.query"),
                "key": dense(base + ".attention.self.key"),
                "value": dense(base + ".attention.self.value"),
                "out": dense(base + ".attention.output.dense"),
            },
            "attention_ln": ln(base + ".attention.output.LayerNorm"),
            "intermediate": dense(base + ".intermediate.dense"),
            "output": dense(base + ".output.dense"),
            "output_ln": ln(base + ".output.LayerNorm"),
        }
        i += 1
    return p


def convert_hf_albert_params(state_dict: dict) -> dict:
    """Map an HF AlbertModel state_dict to this encoder's param tree
    (shared block under "layer_shared"; factorized embedding projection)."""

    def a(t):
        t = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        return jnp.asarray(t)

    def dense(prefix):
        return {"kernel": a(state_dict[prefix + ".weight"]).T,
                "bias": a(state_dict[prefix + ".bias"])}

    def ln(prefix):
        return {"scale": a(state_dict[prefix + ".weight"]),
                "bias": a(state_dict[prefix + ".bias"])}

    # refuse multi-group checkpoints (they have >1 distinct block; mapping
    # group 0 alone would be silently wrong)
    extra = [k for k in state_dict
             if ".albert_layer_groups." in k
             and not k.startswith("encoder.albert_layer_groups.0.albert_layers.0.")]
    assert not extra, (
        f"multi-group ALBERT checkpoint not supported (found {extra[:3]}...)")
    layer = "encoder.albert_layer_groups.0.albert_layers.0"
    return {
        "word_embeddings": {"embedding": a(state_dict[
            "embeddings.word_embeddings.weight"])},
        "position_embeddings": {"embedding": a(state_dict[
            "embeddings.position_embeddings.weight"])},
        "token_type_embeddings": {"embedding": a(state_dict[
            "embeddings.token_type_embeddings.weight"])},
        "embeddings_ln": ln("embeddings.LayerNorm"),
        "embedding_projection": dense("encoder.embedding_hidden_mapping_in"),
        "layer_shared": {
            "attention": {
                "query": dense(layer + ".attention.query"),
                "key": dense(layer + ".attention.key"),
                "value": dense(layer + ".attention.value"),
                "out": dense(layer + ".attention.dense"),
            },
            "attention_ln": ln(layer + ".attention.LayerNorm"),
            "intermediate": dense(layer + ".ffn"),
            "output": dense(layer + ".ffn_output"),
            "output_ln": ln(layer + ".full_layer_layer_norm"),
        },
    }


def config_from_hf(hf_config) -> TextEncoderConfig:
    """Build a TextEncoderConfig from an HF Bert/Roberta/AlbertConfig."""
    if hf_config.model_type == "albert":
        # The flax module shares ONE block across layers; multi-group ALBERT
        # (num_hidden_groups > 1 or inner_group_num > 1) has several distinct
        # blocks and would convert silently wrong.
        assert getattr(hf_config, "num_hidden_groups", 1) == 1, (
            "only num_hidden_groups=1 ALBERT is supported")
        assert getattr(hf_config, "inner_group_num", 1) == 1, (
            "only inner_group_num=1 ALBERT is supported")
        return TextEncoderConfig(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.intermediate_size,
            max_position_embeddings=hf_config.max_position_embeddings,
            type_vocab_size=hf_config.type_vocab_size,
            layer_norm_eps=hf_config.layer_norm_eps,
            hidden_dropout=hf_config.hidden_dropout_prob,
            attention_dropout=hf_config.attention_probs_dropout_prob,
            pad_token_id=hf_config.pad_token_id or 0,
            embedding_size=hf_config.embedding_size,
            share_layers=True,
            # v2 checkpoints say "gelu_new"; v1 says "gelu" (exact)
            hidden_act=getattr(hf_config, "hidden_act", "gelu_new"),
            raw_cls_pool=True,
        )
    is_roberta = hf_config.model_type in ("roberta", "camembert", "xlm-roberta")
    return TextEncoderConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
        layer_norm_eps=hf_config.layer_norm_eps,
        hidden_dropout=hf_config.hidden_dropout_prob,
        attention_dropout=hf_config.attention_probs_dropout_prob,
        pad_token_id=hf_config.pad_token_id or 0,
        roberta_style_positions=is_roberta,
    )
