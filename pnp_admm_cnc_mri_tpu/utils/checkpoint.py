"""Solver-state snapshots: save/resume long sweeps (SURVEY.md §5).

The reference has no checkpointing — a crash loses the run. Here any
ADMMState pytree (plus iteration counter and config) round-trips through
one .npz; resuming continues the scan from the saved iterate.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import numpy as np

from pnp_admm_cnc_mri_tpu.config import ADMMConfig
from pnp_admm_cnc_mri_tpu.solvers.admm import ADMMState


def save_state(path: str, state: ADMMState, iteration: int, cfg: Optional[ADMMConfig] = None) -> None:
    if not path.endswith(".npz"):
        # np.savez appends '.npz' to other suffixes, which would break the
        # save/load round trip under the caller's original path
        raise ValueError(f"checkpoint path must end in .npz, got {path!r}")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "x": np.asarray(state.x),
        "z": np.asarray(state.z),
        "w": np.asarray(state.w),
        "iteration": np.asarray(iteration),
    }
    if cfg is not None:
        payload["config_json"] = np.frombuffer(
            json.dumps(dataclasses.asdict(cfg)).encode(), dtype=np.uint8
        )
    np.savez(path, **payload)


def load_state(path: str) -> Tuple[ADMMState, int, Optional[ADMMConfig]]:
    with np.load(path) as z:
        state = ADMMState(x=z["x"], z=z["z"], w=z["w"])
        it = int(z["iteration"])
        cfg = None
        if "config_json" in z.files:
            cfg = ADMMConfig(**json.loads(bytes(z["config_json"]).decode()))
    return state, it, cfg


def resume_admm(path: str, y, mask, z_update, clamp: bool = False,
                use_rfft: bool = True):
    """Continue a checkpointed run to its configured iteration count."""
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.ops import fourier
    from pnp_admm_cnc_mri_tpu.solvers import admm

    state, it, cfg = load_state(path)
    if cfg is None:
        raise ValueError(f"{path} has no embedded config")
    state = ADMMState(*(jnp.asarray(a) for a in state))
    remaining = cfg.iter_num - it
    import jax

    # use the same data-consistency path as run_admm so a resumed run is
    # numerically identical to an uninterrupted one
    dc = fourier.make_rfft_data_consistency(y, mask, cfg.rho) if use_rfft else None

    def step(s, i):
        return admm.admm_step(s, i + it, y, mask, cfg.rho, z_update, clamp, dc=dc), None

    final, _ = jax.lax.scan(step, state, jnp.arange(max(remaining, 0)))
    return final, cfg


def save_fista_state(path: str, state, iteration: int,
                     meta: Optional[dict] = None) -> None:
    """Snapshot a ``solvers.fista.FISTAState`` (x, v, t) + iteration.

    ``meta``: optional JSON-serializable solve parameters (iter_num,
    step, lam, ...) embedded for resume.
    """
    if not path.endswith(".npz"):
        raise ValueError(f"checkpoint path must end in .npz, got {path!r}")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "fista_x": np.asarray(state.x),
        "fista_v": np.asarray(state.v),
        "fista_t": np.asarray(state.t),
        "iteration": np.asarray(iteration),
    }
    if meta is not None:
        payload["meta_json"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **payload)


def load_fista_state(path: str):
    """-> (FISTAState, iteration, meta dict or None)."""
    from pnp_admm_cnc_mri_tpu.solvers.fista import FISTAState

    with np.load(path) as z:
        state = FISTAState(x=z["fista_x"], v=z["fista_v"], t=z["fista_t"])
        it = int(z["iteration"])
        meta = None
        if "meta_json" in z.files:
            meta = json.loads(bytes(z["meta_json"]).decode())
    return state, it, meta


def save_iterate_state(path: str, x, iteration: int, kind: str,
                       meta: Optional[dict] = None) -> None:
    """Snapshot a single-iterate solver state (HQS's z / RED's x) +
    iteration. ``kind`` tags the solver family ('hqs' or 'red') so a
    checkpoint cannot be resumed by the wrong driver; ``meta`` embeds the
    solve parameters (HQS: the remaining alphas ladder; RED: lam/step/
    variant) as JSON."""
    if not path.endswith(".npz"):
        raise ValueError(f"checkpoint path must end in .npz, got {path!r}")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "iterate": np.asarray(x),
        "iteration": np.asarray(iteration),
        "kind": np.frombuffer(kind.encode(), dtype=np.uint8),
    }
    if meta is not None:
        payload["meta_json"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **payload)


def load_iterate_state(path: str, kind: Optional[str] = None):
    """-> (iterate, iteration, meta dict or None). ``kind`` (if given)
    must match the tag the snapshot was saved with."""
    with np.load(path) as z:
        x = z["iterate"]
        it = int(z["iteration"])
        saved_kind = bytes(z["kind"]).decode()
        meta = None
        if "meta_json" in z.files:
            meta = json.loads(bytes(z["meta_json"]).decode())
    if kind is not None and saved_kind != kind:
        raise ValueError(
            f"{path} is a {saved_kind!r} checkpoint, not {kind!r}")
    return x, it, meta


def resume_hqs(path: str, y, mask, denoise, iter_num: Optional[int] = None):
    """Continue a checkpointed HQS run (``solvers.hqs.run_hqs``) to
    ``iter_num`` total iterations. The alphas ladder comes from the
    embedded meta (saved as a list), so the resumed run walks exactly the
    remaining rungs — numerically identical to an uninterrupted run."""
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.ops import fourier, prox as prox_mod

    z0, it, meta = load_iterate_state(path, kind="hqs")
    meta = meta or {}
    alphas = meta.get("alphas")
    if alphas is None:
        raise ValueError(f"{path} has no embedded alphas ladder")
    iter_num = iter_num if iter_num is not None else len(alphas)
    clamp = meta.get("clamp", True)
    z0 = jnp.asarray(z0)
    alphas_j = jnp.asarray(np.asarray(alphas), z0.dtype)

    def step(z, i):
        x = fourier.data_consistency(z, y, mask, 1.0 / (2.0 * alphas_j[i]))
        z_new = denoise(x.astype(z.dtype), i).astype(z.dtype)
        return prox_mod.clip01(z_new) if clamp else z_new, None

    final, _ = jax.lax.scan(step, z0, jnp.arange(it, max(iter_num, it)))
    return final, meta


def save_hqs(path: str, z, iteration: int, alphas, clamp: bool = True,
             meta: Optional[dict] = None) -> None:
    """Snapshot an HQS run (``solvers.hqs.run_hqs``): records the alphas
    ladder AND the clamp flag automatically so a clamp=False run resumes
    with clamp=False (``resume_hqs`` defaults clamp=True when absent)."""
    m = dict(meta or {})
    m["alphas"] = [float(a) for a in np.asarray(alphas)]
    m["clamp"] = bool(clamp)
    save_iterate_state(path, z, iteration, kind="hqs", meta=m)


def save_consensus_hqs(path: str, z, iteration: int, alphas,
                       clamp: bool = True,
                       meta: Optional[dict] = None) -> None:
    """Snapshot a consensus-HQS run
    (``parallel.consensus.run_consensus_hqs``): records alphas + clamp
    automatically (see :func:`save_hqs`)."""
    m = dict(meta or {})
    m["alphas"] = [float(a) for a in np.asarray(alphas)]
    m["clamp"] = bool(clamp)
    save_iterate_state(path, z, iteration, kind="consensus_hqs", meta=m)


def resume_consensus_hqs(path: str, ys, masks, denoise,
                         iter_num: Optional[int] = None):
    """Continue a checkpointed consensus-HQS run
    (``parallel.consensus.run_consensus_hqs``) to ``iter_num`` total
    iterations. The summed k-space data ``S`` and sampling count ``c``
    are recomputed from ``ys``/``masks`` (they are pure reductions of
    the inputs); the alphas ladder + clamp flag come from the embedded
    meta (use :func:`save_consensus_hqs` to record both), so the resumed
    run walks exactly the remaining rungs via the solver's own
    ``consensus_hqs_step`` — numerically identical to an uninterrupted
    run."""
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.parallel import consensus

    z0, it, meta = load_iterate_state(path, kind="consensus_hqs")
    meta = meta or {}
    alphas = meta.get("alphas")
    if alphas is None:
        raise ValueError(f"{path} has no embedded alphas ladder")
    iter_num = iter_num if iter_num is not None else len(alphas)
    clamp = meta.get("clamp", True)
    z0 = jnp.asarray(z0)
    alphas_j = jnp.asarray(np.asarray(alphas), z0.dtype)

    m = (jnp.asarray(masks) != 0).astype(jnp.asarray(ys).real.dtype)
    cnt = jnp.sum(m, axis=-3)
    S = jnp.sum(jnp.where(m != 0, jnp.asarray(ys), 0.0), axis=-3)

    def step(z, i):
        return consensus.consensus_hqs_step(
            z, i, alphas_j[i], S, cnt, denoise, clamp, z.dtype), None

    final, _ = jax.lax.scan(step, z0, jnp.arange(it, max(iter_num, it)))
    return final, meta


def save_consensus_state(path: str, z, w, iteration: int,
                         cfg: Optional[ADMMConfig] = None) -> None:
    """Snapshot a consensus-ADMM run
    (``parallel.consensus.run_consensus(..., return_state=True)``):
    global iterate z + per-observation duals w (N, H, W)."""
    if not path.endswith(".npz"):
        raise ValueError(f"checkpoint path must end in .npz, got {path!r}")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "consensus_z": np.asarray(z),
        "consensus_w": np.asarray(w),
        "iteration": np.asarray(iteration),
    }
    if cfg is not None:
        payload["config_json"] = np.frombuffer(
            json.dumps(dataclasses.asdict(cfg)).encode(), dtype=np.uint8
        )
    np.savez(path, **payload)


def load_consensus_state(path: str):
    """-> (z, w, iteration, ADMMConfig or None)."""
    with np.load(path) as f:
        if "consensus_z" not in f.files:
            raise ValueError(f"{path} is not a consensus-ADMM checkpoint")
        z = f["consensus_z"]
        w = f["consensus_w"]
        it = int(f["iteration"])
        cfg = None
        if "config_json" in f.files:
            cfg = ADMMConfig(**json.loads(bytes(f["config_json"]).decode()))
    return z, w, it, cfg


def resume_consensus_admm(path: str, ys, masks, z_prox=None,
                          dc_method: str = "auto"):
    """Continue a checkpointed consensus-ADMM run
    (``parallel.consensus.run_consensus``) to its configured iteration
    count. The data-consistency closure is rebuilt from ``ys``/``masks``
    + the embedded cfg.rho exactly as ``run_consensus`` builds it, and the
    iterations replay the solver's own ``consensus_admm_step`` — so a
    resumed run is numerically identical to an uninterrupted one.
    ``z_prox`` defaults like the solver (L1 soft at cfg.rho*cfg.lam).
    Returns (z, per-obs x, cfg) matching ``run_consensus``'s outputs."""
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.ops import fourier, prox as prox_mod
    from pnp_admm_cnc_mri_tpu.parallel import consensus

    z0, w0, it, cfg = load_consensus_state(path)
    if cfg is None:
        raise ValueError(f"{path} has no embedded config")
    if z_prox is None:
        z_prox = lambda v, i: prox_mod.soft(v, cfg.rho * cfg.lam)
    z0 = jnp.asarray(z0)
    w0 = jnp.asarray(w0)
    dtype = z0.dtype
    dc = fourier.make_rfft_data_consistency(
        ys, masks, cfg.rho, method=fourier.resolve_dc_method(dc_method, ys))

    def step(carry, i):
        z, w = carry
        return consensus.consensus_admm_step(z, w, dc, z_prox, i, dtype), None

    (z, w), _ = jax.lax.scan(step, (z0, w0),
                             jnp.arange(it, max(cfg.iter_num, it)))
    x = dc(z[..., None, :, :] - w).astype(dtype)
    return z, x, cfg


def save_consensus_fista(path: str, state, iteration: int, iter_num: int,
                         step: float = 1.0, precondition: bool = True,
                         meta: Optional[dict] = None) -> None:
    """Snapshot a consensus-FISTA run
    (``parallel.consensus.run_consensus_fista(..., return_state=True)``):
    records iter_num/step/precondition automatically and tags the family
    so a plain-FISTA driver cannot resume it by accident."""
    m = dict(meta or {})
    m.update({"family": "consensus_fista", "iter_num": int(iter_num),
              "step": float(step), "precondition": bool(precondition)})
    save_fista_state(path, state, iteration, meta=m)


def resume_consensus_fista(path: str, ys, masks, prox_fn,
                           iter_num: Optional[int] = None,
                           step: Optional[float] = None):
    """Continue a checkpointed consensus-FISTA run
    (``parallel.consensus.run_consensus_fista``) to ``iter_num`` total
    iterations. The mask/count/data reductions are rebuilt from
    ``ys``/``masks`` via the solver's own ``consensus_fista_setup`` and
    the iterations replay ``consensus_fista_iteration`` (momentum t
    resumes from the snapshot) — numerically identical to an
    uninterrupted run."""
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.parallel import consensus
    from pnp_admm_cnc_mri_tpu.solvers.fista import FISTAState

    state, it, meta = load_fista_state(path)
    meta = meta or {}
    if meta.get("family") != "consensus_fista":
        raise ValueError(
            f"{path} is not a consensus-FISTA checkpoint "
            f"(family={meta.get('family')!r}); use resume_fista")
    iter_num = iter_num if iter_num is not None else meta.get("iter_num")
    step = step if step is not None else meta.get("step", 1.0)
    precondition = meta.get("precondition", True)
    if iter_num is None:
        raise ValueError(f"{path} has no embedded iter_num; pass it")
    state = FISTAState(*(jnp.asarray(a) for a in state))
    dtype = state.x.dtype
    m, ysz, cnt = consensus.consensus_fista_setup(
        jnp.asarray(ys), jnp.asarray(masks), precondition)

    def iteration(s, i):
        return consensus.consensus_fista_iteration(
            s, i, m, ysz, cnt, prox_fn, step, dtype), None

    final, _ = jax.lax.scan(iteration, state,
                            jnp.arange(it, max(iter_num, it)))
    return final, meta


def resume_red(path: str, y, mask, denoise, iter_num: Optional[int] = None):
    """Continue a checkpointed RED run (``solvers.red.run_red``) to
    ``iter_num`` total iterations with the embedded (lam, step, variant)."""
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.ops import fourier, prox as prox_mod

    x0, it, meta = load_iterate_state(path, kind="red")
    meta = meta or {}
    iter_num = iter_num if iter_num is not None else meta.get("iter_num")
    if iter_num is None:
        raise ValueError(f"{path} has no embedded iter_num; pass it")
    lam = meta.get("lam", 0.2)
    step_sz = meta.get("step", 1.0)
    variant = meta.get("variant", "fp")
    clamp = meta.get("clamp", True)
    x0 = jnp.asarray(x0)
    dtype = x0.dtype

    def iteration(x, i):
        g = jnp.real(fourier.data_term_gradient(x, y, mask)).astype(dtype)
        dx = denoise(x, i).astype(dtype)
        if variant == "gd":
            x_new = x - step_sz * (g + lam * (x - dx))
        else:
            x_new = (x - step_sz * g + step_sz * lam * dx) / (1.0 + step_sz * lam)
        return prox_mod.clip01(x_new) if clamp else x_new, None

    final, _ = jax.lax.scan(iteration, x0, jnp.arange(it, max(iter_num, it)))
    return final, meta


def resume_fista(path: str, y, mask, prox_fn, iter_num: Optional[int] = None,
                 step: Optional[float] = None):
    """Continue a checkpointed FISTA run to ``iter_num`` total iterations
    (defaults from the embedded meta). Numerically identical to an
    uninterrupted run: the momentum scalar t resumes from the snapshot
    and the prox sees the true global iteration index."""
    import jax
    import jax.numpy as jnp

    from pnp_admm_cnc_mri_tpu.ops import fourier
    from pnp_admm_cnc_mri_tpu.solvers.fista import (FISTAState,
                                                    fista_extrapolate)

    state, it, meta = load_fista_state(path)
    meta = meta or {}
    if meta.get("family") == "consensus_fista":
        raise ValueError(
            f"{path} is a consensus-FISTA checkpoint; "
            f"use resume_consensus_fista")
    iter_num = iter_num if iter_num is not None else meta.get("iter_num")
    step = step if step is not None else meta.get("step", 1.0)
    if iter_num is None:
        raise ValueError(f"{path} has no embedded iter_num; pass it")
    state = FISTAState(*(jnp.asarray(a) for a in state))
    dtype = state.x.dtype

    def iteration(s, i):
        g = jnp.real(fourier.data_term_gradient(s.v, y, mask)).astype(dtype)
        x_new = prox_fn(i, s.v - step * g).astype(dtype)
        t_new, v_new = fista_extrapolate(s.x, x_new, s.t)
        return FISTAState(x=x_new, v=v_new, t=t_new), None

    final, _ = jax.lax.scan(iteration, state,
                            jnp.arange(it, max(iter_num, it)))
    return final, meta
