"""Load pretrained HF encoder checkpoints into the flax TextEncoder.

The reference starts every training run from pretrained HF weights
(reference modeling/modeling_encoder.py:102-108 — AutoModel.from_pretrained
inside TextEncoder.__init__ — and qagnn.py:124-125 for the entity table).
This module is the TPU-side equivalent: read a torch checkpoint from disk
(an HF save_pretrained directory, a raw torch state-dict file, or a cached
hub name), map it through the converters in qagnn_tpu.models.text_encoder,
and return (TextEncoderConfig, encoder params) ready to merge into the
model's param tree before step 0.

Accepted sources for `load_encoder_checkpoint(src)`:
  * directory: config.json + (model.safetensors | pytorch_model.bin)
  * file: a torch.save'd state dict (config inferred only if shapes allow;
    pass `fallback_config` for this case)
  * hub name: resolved through transformers' local cache (offline-safe via
    HF_HUB_OFFLINE; no downloads are attempted when the cache misses —
    the error is surfaced to the caller)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax.numpy as jnp

from qagnn_tpu.models.text_encoder import (
    TextEncoderConfig,
    config_from_hf,
    convert_hf_albert_params,
    convert_hf_encoder_params,
)

# base-model prefixes used by HF task heads (e.g. ...ForMaskedLM checkpoints)
_BASE_PREFIXES = ("bert.", "roberta.", "albert.", "transformer.", "model.")
# head weights that have no place in the bare encoder
_HEAD_PREFIXES = ("cls.", "lm_head.", "classifier.", "qa_outputs.",
                  "predictions.", "sop_classifier.")


# first-key markers of a bare encoder state dict, per family
_BARE_MARKERS = ("embeddings.", "tokens_embed.", "word_embedding.")


def strip_hf_prefixes(state_dict: dict[str, Any]) -> dict[str, Any]:
    """Unwrap task-model checkpoints to bare-encoder key names."""
    keys = list(state_dict)
    if not any(k.startswith(_BARE_MARKERS) for k in keys):
        for pref in _BASE_PREFIXES:
            if any(k.startswith(pref + m) for k in keys
                   for m in _BARE_MARKERS):
                state_dict = {k[len(pref):]: v for k, v in state_dict.items()
                              if k.startswith(pref)}
                break
    return {k: v for k, v in state_dict.items()
            if not k.startswith(_HEAD_PREFIXES)}


def _read_weights_file(path: str) -> dict[str, Any]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj and \
            not any("." in k for k in obj):
        obj = obj["state_dict"]
    return dict(obj)


def _read_checkpoint(src: str):
    """Return (state_dict, hf_config | None)."""
    if os.path.isdir(src):
        cfg = None
        cfg_path = os.path.join(src, "config.json")
        if os.path.exists(cfg_path):
            try:
                from transformers import AutoConfig
                cfg = AutoConfig.from_pretrained(src)
            except Exception:
                # fall back to a plain-attribute view of the JSON
                import types
                with open(cfg_path) as f:
                    cfg = types.SimpleNamespace(**json.load(f))
        for name in ("model.safetensors", "pytorch_model.bin"):
            wpath = os.path.join(src, name)
            if os.path.exists(wpath):
                return _read_weights_file(wpath), cfg
        raise FileNotFoundError(
            f"no model.safetensors / pytorch_model.bin in {src!r}")
    if os.path.isfile(src):
        return _read_weights_file(src), None
    # hub name through the local transformers cache (zero-egress safe:
    # HF_HUB_OFFLINE raises instead of downloading)
    from transformers import AutoConfig, AutoModel
    model = AutoModel.from_pretrained(src)
    return dict(model.state_dict()), AutoConfig.from_pretrained(src)


def load_encoder_checkpoint(
    src: str,
    dtype=jnp.float32,
    fallback_config: TextEncoderConfig | None = None,
) -> tuple[TextEncoderConfig, dict]:
    """Load a pretrained encoder checkpoint.

    Returns (config, params) where `params` drops into the LMQAGNN tree as
    params["encoder"] (see qagnn_tpu.cli.train / train.step._merge_pretrained).
    When the source carries an HF config, the returned TextEncoderConfig is
    derived from it (shape always matches the weights); otherwise
    `fallback_config` is used.
    """
    state_dict, hf_cfg = _read_checkpoint(src)
    state_dict = strip_hf_prefixes(state_dict)

    is_albert = any(".albert_layer_groups." in k for k in state_dict)
    is_gpt = "tokens_embed.weight" in state_dict
    is_xlnet = "word_embedding.weight" in state_dict

    if hf_cfg is not None:
        if is_gpt:
            from qagnn_tpu.models.gpt_encoder import gpt_config_from_hf
            cfg = gpt_config_from_hf(hf_cfg)
        elif is_xlnet:
            from qagnn_tpu.models.xlnet_encoder import xlnet_config_from_hf
            cfg = xlnet_config_from_hf(hf_cfg)
        else:
            cfg = config_from_hf(hf_cfg)
    elif fallback_config is not None:
        cfg = fallback_config
    else:
        raise ValueError(
            f"{src!r} carries no config.json; pass fallback_config")
    cfg = dataclasses.replace(cfg, dtype=dtype)

    if is_gpt:
        from qagnn_tpu.models.gpt_encoder import convert_hf_gpt_params
        params = convert_hf_gpt_params(state_dict)
        cfg, params = _resize_gpt_vocab(cfg, params)
    elif is_xlnet:
        from qagnn_tpu.models.xlnet_encoder import convert_hf_xlnet_params
        params = convert_hf_xlnet_params(state_dict)
    elif is_albert:
        params = convert_hf_albert_params(state_dict)
    else:
        params = convert_hf_encoder_params(state_dict)
    return cfg, params


def _resize_gpt_vocab(cfg, params, n_special: int = 3):
    """Grow the GPT token table for the 3 statement special tokens
    (_start_/_delimiter_/_classify_), matching the reference's
    resize_token_embeddings(get_gpt_token_num)
    (reference modeling/modeling_encoder.py:105-106,
    utils/data_utils.py:284-287). New rows are normal(0, 0.02) like HF's
    resize init, seeded deterministically."""
    import numpy as np

    table = np.asarray(params["tokens_embed"]["embedding"])
    if table.shape[0] != 40478:   # stock openai-gpt BPE vocab, pre-resize
        return cfg, params        # already resized (or a tiny test model)
    target = table.shape[0] + n_special
    if cfg.vocab_size < target:
        rng = np.random.default_rng(0)
        extra = rng.normal(0.0, 0.02,
                           (target - table.shape[0], table.shape[1]))
        params["tokens_embed"]["embedding"] = jnp.asarray(
            np.concatenate([table, extra.astype(table.dtype)], axis=0))
        cfg = dataclasses.replace(cfg, vocab_size=target)
    return cfg, params
