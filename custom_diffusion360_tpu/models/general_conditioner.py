"""Config-driven conditioner: arbitrary embedder lists with key routing.

Functional mirror of GeneralConditioner (sgm/modules/encoders/
modules.py:73-230). The production SDXL stack uses the specialized
models/conditioner.py (faster: fixed structure, fused towers); this module
is the general machine for arbitrary embedder combinations (T5, class
labels, image embedders, low-scale latents, ... — see models/embedders.py):

* each embedder output routes to "vector"/"crossattn"/"concat" by rank
  (OUTPUT_DIM2KEYS, :74) and concatenates along the feature axis
  (KEY2CATDIM, :75 — the concat dim is channels; we are NHWC so axis -1
  everywhere);
* ``input_keys`` pairs ("txt,txt_ref") embed target and reference values and
  produce the [target-rows, ref-rows] batch-concat contract (:136-143,
  :195-207); ``force_ref_zero`` embeds the target key only (:136-137);
* per-embedder ucg_rate applies bernoulli row dropout with an explicit PRNG
  key (:152-162); ``legacy_ucg_val`` substitution is the host-side helper
  ``possibly_apply_legacy_ucg`` (:113-120);
* ``get_unconditional_conditioning`` disables ucg for both passes
  (:212-230).

Deviation (documented): the reference splits paired outputs back apart with
``emb.chunk(2)`` (:177,197), which is only exact when target and reference
row counts match; here the split point is the target batch size, the correct
generalization (identical behavior for equal halves).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

OUTPUT_DIM2KEYS = {2: "vector", 3: "crossattn", 4: "concat", 5: "concat"}


@dataclasses.dataclass(frozen=True)
class EmbedderSpec:
    """One conditioner entry. ``embed(params_slot, value) -> array`` (or a
    tuple of arrays, each routed separately, like always_return_pooled
    embedders)."""

    name: str
    embed: Callable[[Any, Any], Any]
    input_key: Optional[str] = None
    input_keys: Optional[Tuple[str, str]] = None
    ucg_rate: float = 0.0
    legacy_ucg_val: Any = None

    def __post_init__(self):
        if (self.input_key is None) == (self.input_keys is None):
            raise ValueError(
                f"embedder {self.name}: need exactly one of input_key/"
                "input_keys (modules.py:97-104)"
            )


def possibly_apply_legacy_ucg(spec: EmbedderSpec, batch: dict, rng) -> dict:
    """Host-side legacy ucg: replace batch[input_key][i] by legacy_ucg_val
    with probability ucg_rate (modules.py:113-120). ``rng`` is a
    numpy.random.Generator; returns a shallow-copied batch."""
    if spec.legacy_ucg_val is None:
        return batch
    vals = list(batch[spec.input_key])
    for i in range(len(vals)):
        if rng.choice(2, p=[1 - spec.ucg_rate, spec.ucg_rate]):
            vals[i] = spec.legacy_ucg_val
    out = dict(batch)
    out[spec.input_key] = vals
    return out


def _route(output, emb, spec, tgt_rows, force_zero, force_ref_zero, key):
    """Route one embedder output array into the output dict."""
    out_key = OUTPUT_DIM2KEYS[emb.ndim]
    if spec.ucg_rate > 0.0 and spec.legacy_ucg_val is None:
        if key is None:
            raise ValueError(f"embedder {spec.name}: ucg_rate needs a key")
        keep = jax.random.bernoulli(key, 1.0 - spec.ucg_rate, (emb.shape[0],))
        emb = emb * keep.reshape((-1,) + (1,) * (emb.ndim - 1)).astype(emb.dtype)
    zero_names = set(force_zero)
    if (spec.input_key in zero_names) or (
        spec.input_keys is not None and spec.input_keys[0] in zero_names
    ):
        emb = jnp.zeros_like(emb)

    if spec.input_keys is not None and not force_ref_zero:
        tgt, ref = emb[:tgt_rows], emb[tgt_rows:]
        pairs = ((out_key, tgt), (out_key + "_ref", ref))
    else:
        pairs = ((out_key, emb),)
    for k, v in pairs:
        output[k] = (
            v if k not in output
            else jnp.concatenate([output[k], v], axis=-1)
        )


def general_conditioner_apply(
    params: dict,
    specs: Sequence[EmbedderSpec],
    batch: dict,
    key=None,
    force_zero_embeddings: Sequence[str] = (),
    force_ref_zero_embeddings: bool = False,
):
    """-> dict with "vector"/"crossattn"/"concat" as present; paired-key
    embedders contribute [target-rows | ref-rows] along batch (the
    conditioner contract consumed by the UNet/guiders)."""
    output: dict = {}
    n_specs = len(specs)
    keys = (
        jax.random.split(key, n_specs) if key is not None else [None] * n_specs
    )
    for spec, k in zip(specs, keys):
        slot = params.get(spec.name)
        if spec.input_key is not None:
            emb_out = spec.embed(slot, batch[spec.input_key])
            tgt_rows = None
        elif force_ref_zero_embeddings:
            emb_out = spec.embed(slot, batch[spec.input_keys[0]])
            tgt_rows = None
        else:
            outs = [spec.embed(slot, batch[kk]) for kk in spec.input_keys]
            tgt_rows = jax.tree.leaves(outs[0])[0].shape[0]
            if isinstance(outs[0], (tuple, list)):
                emb_out = [
                    jnp.concatenate([o[i] for o in outs], axis=0)
                    for i in range(len(outs[0]))
                ]
            else:
                emb_out = jnp.concatenate(outs, axis=0)
        if not isinstance(emb_out, (tuple, list)):
            emb_out = [emb_out]
        for emb in emb_out:
            _route(output, emb, spec, tgt_rows, force_zero_embeddings,
                   force_ref_zero_embeddings, k)

    # merge ref rows after the target rows (modules.py:205-208)
    for out_key in ("vector", "crossattn", "concat"):
        rk = out_key + "_ref"
        if rk in output:
            output[out_key] = jnp.concatenate(
                [output[out_key], output.pop(rk)], axis=0
            )
    return output


def general_get_unconditional_conditioning(
    params,
    specs: Sequence[EmbedderSpec],
    batch_c: dict,
    batch_uc: Optional[dict] = None,
    force_uc_zero_embeddings: Sequence[str] = (),
    force_ref_zero_embeddings: bool = False,
):
    """(c, uc) with ucg disabled for both passes (modules.py:212-230)."""
    no_ucg = [dataclasses.replace(s, ucg_rate=0.0) for s in specs]
    c = general_conditioner_apply(
        params, no_ucg, batch_c,
        force_ref_zero_embeddings=force_ref_zero_embeddings,
    )
    uc = general_conditioner_apply(
        params, no_ucg, batch_c if batch_uc is None else batch_uc,
        force_zero_embeddings=force_uc_zero_embeddings,
        force_ref_zero_embeddings=force_ref_zero_embeddings,
    )
    return c, uc
