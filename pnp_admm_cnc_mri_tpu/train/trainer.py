"""Denoiser training on TPU: jitted optax steps over a sharded mesh.

New capability (the reference ships no training, SURVEY.md §5
checkpoint/resume): train the Gaussian denoisers used as PnP priors.

Parallelism layout (idiomatic JAX, no reference counterpart):
- data parallelism: batch axis sharded over the mesh ``data`` axis;
  gradients are averaged by XLA-inserted collectives (GSPMD) because the
  loss is a mean over the global batch;
- optional tensor parallelism: conv channel dimensions of the network body
  sharded over the ``space`` axis via parameter PartitionSpecs — GSPMD
  inserts the all-gathers/reduce-scatters;
- checkpoint/resume via orbax (or plain npz through ``models.convert``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    loss: str = "l2"  # 'l2' (DnCNN-style) or 'l1' (FDnCNN-style)
    grad_clip: Optional[float] = 1.0
    lr_decay: Optional[str] = None  # None (constant) or 'cosine'
    lr_floor: float = 0.1  # cosine alpha: final lr = floor * learning_rate


def make_loss_fn(model_apply: Callable, loss: str = "l2", conditioned: bool = False):
    """Loss over a (noisy, clean, sigma_map) batch.

    ``conditioned``: the model takes a noise-map channel (FDnCNN/DRUNet) —
    the sigma map is concatenated; FFDNet-style models that take sigma as a
    separate argument wrap their apply accordingly before passing it here.
    """

    def loss_fn(params, noisy, clean, sigma):
        if conditioned:
            sm = jnp.broadcast_to(sigma, noisy.shape)
            inp = jnp.concatenate([noisy, sm], axis=-1)
            pred = model_apply(params, inp)
        else:
            pred = model_apply(params, noisy)
        err = pred - clean
        if loss == "l1":
            return jnp.mean(jnp.abs(err))
        return 0.5 * jnp.mean(err**2)

    return loss_fn


def make_train_step(loss_fn: Callable, optimizer) -> Callable:
    """Build the jittable (params, opt_state, batch) -> (params, opt_state,
    loss) step. Sharding comes from the argument placements (GSPMD)."""

    @jax.jit
    def train_step(params, opt_state, noisy, clean, sigma):
        loss, grads = jax.value_and_grad(loss_fn)(params, noisy, clean, sigma)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_optimizer(cfg: TrainConfig, steps: Optional[int] = None):
    """Optimizer from config. ``steps`` enables the cosine-decay schedule
    (lr -> lr_floor * lr over the run) — short runs on small corpora gain
    ~0.5-1 dB from the annealed tail vs a constant rate."""
    lr = cfg.learning_rate
    if cfg.lr_decay == "cosine" and steps:
        lr = optax.cosine_decay_schedule(cfg.learning_rate, steps, alpha=cfg.lr_floor)
    tx = []
    if cfg.grad_clip:
        tx.append(optax.clip_by_global_norm(cfg.grad_clip))
    if cfg.weight_decay:
        tx.append(optax.adamw(lr, weight_decay=cfg.weight_decay))
    else:
        tx.append(optax.adam(lr))
    return optax.chain(*tx)


def shard_params_tp(params, mesh: Mesh, axis: str = "space"):
    """Tensor-parallel placement: shard conv kernels on the output-channel
    dim (HWIO -> axis 3) and biases on their only dim when divisible by the
    mesh axis; everything else replicated. GSPMD handles the collectives.
    """
    n = mesh.shape[axis]

    def place(x):
        if hasattr(x, "ndim") and x.ndim == 4 and x.shape[3] % n == 0 and x.shape[3] >= n:
            return NamedSharding(mesh, P(None, None, None, axis))
        if hasattr(x, "ndim") and x.ndim == 1 and x.shape[0] % n == 0 and x.shape[0] >= n:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(lambda x: jax.device_put(x, place(x)), params)


def shard_batch_dp(batch: Tuple, mesh: Mesh, axis: str = "data"):
    """Data-parallel placement of (noisy, clean, sigma) on the batch dim."""
    return tuple(
        jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(axis))) for x in batch
    )


def train_denoiser(
    model,
    patches: np.ndarray,
    sigma,
    steps: int = 1000,
    batch_size: int = 64,
    cfg: TrainConfig = TrainConfig(),
    mesh: Optional[Mesh] = None,
    conditioned: bool = False,
    seed: int = 0,
    log_every: int = 100,
    params: Any = None,
    ffdnet_style: bool = False,
    ckpt_cb: Optional[Callable[[int, Any], None]] = None,
    ckpt_every: int = 0,
):
    """Train a Flax denoiser; returns (params, losses).

    With a ``mesh``, batches are dp-sharded over ``data`` and parameters
    tp-sharded over ``space`` (where divisible). ``ckpt_cb(step, params)``
    is invoked every ``ckpt_every`` steps (and at the end) so long runs
    survive interruption.
    """
    from pnp_admm_cnc_mri_tpu.train import data as data_mod

    rng = jax.random.PRNGKey(seed)
    in_nc = 2 if conditioned else 1
    if params is None:
        dummy = jnp.zeros((1, patches.shape[1], patches.shape[2], in_nc), jnp.float32)
        if ffdnet_style:
            params = model.init(rng, dummy[..., :1], jnp.asarray(0.1))
        else:
            params = model.init(rng, dummy)

    optimizer = make_optimizer(cfg, steps=steps)
    opt_state = optimizer.init(params)

    if ffdnet_style:
        apply = lambda p, noisy_and_sigma: None  # unused; custom loss below

        def loss_fn(params, noisy, clean, sigma):
            pred = model.apply(params, noisy, sigma[:, 0, 0, 0])
            return 0.5 * jnp.mean((pred - clean) ** 2)

    else:
        loss_fn = make_loss_fn(model.apply, cfg.loss, conditioned)
    step_fn = make_train_step(loss_fn, optimizer)

    if mesh is not None:
        params = shard_params_tp(params, mesh)
        # re-init AFTER sharding: optax moments are tree_map(zeros_like,
        # params) and inherit the tensor-parallel placement — force-
        # replicating them would double memory and reshard every step
        opt_state = optimizer.init(params)

    losses = []
    it = data_mod.batches(patches, batch_size, sigma, seed=seed)
    for i, batch in enumerate(it):
        if i >= steps:
            break
        if mesh is not None:
            batch = shard_batch_dp(batch, mesh)
        else:
            batch = tuple(jnp.asarray(x) for x in batch)
        params, opt_state, loss = step_fn(params, opt_state, *batch)
        if i % log_every == 0 or i == steps - 1:
            losses.append((i, float(loss)))
        if ckpt_cb is not None and ckpt_every and (i + 1) % ckpt_every == 0:
            ckpt_cb(i + 1, params)
    # final save, unless the last in-loop checkpoint already covered it
    if ckpt_cb is not None and (not ckpt_every or steps % ckpt_every != 0):
        ckpt_cb(steps, params)
    return params, losses


def train_denoiser_stream(
    model,
    generator: Callable,
    sigma,
    steps: int = 1000,
    batch_size: int = 64,
    patch: int = 64,
    cfg: TrainConfig = TrainConfig(),
    buffer_images: int = 2048,
    refresh_every: int = 0,
    conditioned: bool = False,
    ffdnet_style: bool = False,
    seed: int = 0,
    log_every: int = 100,
    params: Any = None,
    ckpt_cb: Optional[Callable[[int, Any], None]] = None,
    ckpt_every: int = 0,
    ema_decay: Optional[float] = None,
    scan_steps: int = 1,
    teacher_apply: Optional[Callable] = None,
    teacher_params: Any = None,
    distill_weight: float = 1.0,
):
    """Train on an ON-DEVICE procedural corpus (``train.synth``).

    ``generator(key, n) -> (n, gen, gen)`` synthesizes images under jit;
    the trainer keeps a ``buffer_images``-image device buffer and random-
    crops ``patch``-sized training patches from it inside the fused step
    (gather + crop + dihedral + AWGN + optimizer update in one jit).
    ``refresh_every > 0`` regenerates the buffer every that many steps —
    an effectively infinite stream; ``refresh_every == 0`` freezes the
    first buffer, making ``buffer_images`` the corpus-size knob for
    scaling studies. ZERO image bytes cross the host<->device link either
    way (only loss scalars and checkpoints).

    Distillation (``teacher_apply(teacher_params, noisy, sig) -> target``
    given): the loss becomes ``distill_weight`` x MSE(student, teacher) +
    ``(1-distill_weight)`` x MSE(student, clean). The teacher sees the
    SAME noisy batch (stop-gradient), so a student with a cheaper (MXU-
    shaped) architecture inherits the teacher's learned prior on an
    unlimited synthetic stream. ``teacher_params`` ride through the jit
    as arguments (axon rule: no closed-over device constants).
    """
    rng = jax.random.PRNGKey(seed)
    in_nc = 2 if conditioned else 1
    if params is None:
        dummy = jnp.zeros((1, patch, patch, in_nc), jnp.float32)
        if ffdnet_style:
            params = model.init(rng, dummy[..., :1], jnp.asarray(0.1))
        else:
            params = model.init(rng, dummy)

    optimizer = make_optimizer(cfg, steps=steps)
    opt_state = optimizer.init(params)

    if ffdnet_style:
        def student_pred(params, noisy, sig):
            return model.apply(params, noisy, sig[:, 0, 0, 0])
    elif conditioned:
        def student_pred(params, noisy, sig):
            sm = jnp.broadcast_to(sig, noisy.shape)
            return model.apply(params, jnp.concatenate([noisy, sm], axis=-1))
    else:
        def student_pred(params, noisy, sig):
            return model.apply(params, noisy)

    if teacher_apply is not None:
        w_d = float(distill_weight)

        def loss_fn(params, tparams, noisy, clean, sig):
            pred = student_pred(params, noisy, sig)
            tgt = jax.lax.stop_gradient(teacher_apply(tparams, noisy, sig))
            l_distill = 0.5 * jnp.mean((pred - tgt) ** 2)
            l_clean = 0.5 * jnp.mean((pred - clean) ** 2)
            return w_d * l_distill + (1.0 - w_d) * l_clean
    elif ffdnet_style:
        def loss_fn(params, tparams, noisy, clean, sig):
            del tparams
            pred = student_pred(params, noisy, sig)
            return 0.5 * jnp.mean((pred - clean) ** 2)
    else:
        base_loss = make_loss_fn(model.apply, cfg.loss, conditioned)

        def loss_fn(params, tparams, noisy, clean, sig):
            del tparams
            return base_loss(params, noisy, clean, sig)

    lo, hi = sigma if isinstance(sigma, tuple) else (sigma, sigma)

    gen_jit = jax.jit(lambda k: generator(k, buffer_images))

    def _crop(img, top, left):
        return jax.lax.dynamic_slice(img, (top, left), (patch, patch))

    @jax.jit
    def fused_step(params, opt_state, ema, buffer, key, tparams):
        k_idx, k_top, k_left, k_aug, k_sig, k_noise = jax.random.split(key, 6)
        n_buf, gen = buffer.shape[0], buffer.shape[1]
        idx = jax.random.randint(k_idx, (batch_size,), 0, n_buf)
        tops = jax.random.randint(k_top, (batch_size,), 0, gen - patch + 1)
        lefts = jax.random.randint(k_left, (batch_size,), 0, gen - patch + 1)
        clean = jax.vmap(_crop)(buffer[idx], tops, lefts)[..., None]
        modes = jax.random.randint(k_aug, (batch_size,), 0, 8)
        clean = jax.vmap(_dihedral)(clean, modes)
        sig = jax.random.uniform(
            k_sig, (batch_size, 1, 1, 1), jnp.float32, lo, hi)
        noisy = clean + sig * jax.random.normal(k_noise, clean.shape,
                                                jnp.float32)
        loss, grads = jax.value_and_grad(loss_fn)(params, tparams, noisy,
                                                  clean, sig)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_decay is not None:
            ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema,
                params)
        return params, opt_state, ema, loss

    @jax.jit
    def mega_step(params, opt_state, ema, buffer, key, tparams):
        def body(carry, sub):
            params, opt_state, ema = carry
            params, opt_state, ema, loss = fused_step(
                params, opt_state, ema, buffer, sub, tparams)
            return (params, opt_state, ema), loss

        subs = jax.random.split(key, scan_steps)
        (params, opt_state, ema), ls = jax.lax.scan(
            body, (params, opt_state, ema), subs)
        return params, opt_state, ema, ls

    key = jax.random.PRNGKey(seed + 1)
    key, kb = jax.random.split(key)
    buffer = gen_jit(kb)
    if teacher_apply is not None:
        # one-time device staging; thereafter the tree rides the jit calls
        teacher_params = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float32), teacher_params)
    ema = params if ema_decay is not None else None
    out = lambda: ema if ema_decay is not None else params
    losses = []
    done = 0
    last_refresh = 0
    while done < steps:
        key, sub = jax.random.split(key)
        if scan_steps > 1:
            params, opt_state, ema, ls = mega_step(
                params, opt_state, ema, buffer, sub, teacher_params)
            ls = np.asarray(jax.device_get(ls))
            for j in range(0, scan_steps, max(1, log_every)):
                losses.append((done + j, float(ls[j])))
            done += scan_steps
        else:
            params, opt_state, ema, loss = fused_step(
                params, opt_state, ema, buffer, sub, teacher_params)
            if done % log_every == 0:
                losses.append((done, float(loss)))
            done += 1
        if refresh_every and done - last_refresh >= refresh_every:
            key, kb = jax.random.split(key)
            buffer = gen_jit(kb)
            last_refresh = done
        if ckpt_cb is not None and ckpt_every and (
            done % max(ckpt_every, scan_steps) < scan_steps
        ):
            ckpt_cb(done, jax.device_get(out()))
    if ckpt_cb is not None:
        ckpt_cb(done, jax.device_get(out()))
    return out(), losses


def _dihedral(patch, mode):
    """One of the 8 dihedral transforms of a square (H, W, C) patch,
    selected by a traced integer — matches ``data.augment_batch`` modes
    (rot90 by mode%4, then vertical flip for mode>=4)."""
    import jax.lax as lax

    branches = []
    for m in range(8):
        def branch(p, _m=m):
            q = jnp.rot90(p, _m % 4, axes=(0, 1))
            return q[::-1] if _m >= 4 else q

        branches.append(branch)
    return lax.switch(mode, branches, patch)


def stage_to_device(patches: np.ndarray, chunk_bytes: int = 1 << 19):
    """Move the patch corpus host->device in small chunks.

    The axon TPU link stalls on MB-scale single transfers; ~0.5 MB chunks
    go through reliably. Concatenation happens on device under jit.
    """
    per = int(np.prod(patches.shape[1:])) * 4
    chunk = max(1, chunk_bytes // per)
    parts = [
        jax.device_put(jnp.asarray(patches[i : i + chunk], jnp.float32))
        for i in range(0, patches.shape[0], chunk)
    ]
    if len(parts) == 1:
        return parts[0]
    return jax.jit(lambda *cs: jnp.concatenate(cs, axis=0))(*parts)


def train_denoiser_ondevice(
    model,
    patches: np.ndarray,
    sigma,
    steps: int = 1000,
    batch_size: int = 64,
    cfg: TrainConfig = TrainConfig(),
    conditioned: bool = False,
    ffdnet_style: bool = False,
    seed: int = 0,
    log_every: int = 100,
    params: Any = None,
    ckpt_cb: Optional[Callable[[int, Any], None]] = None,
    ckpt_every: int = 0,
    ema_decay: Optional[float] = None,
    scan_steps: int = 1,
):
    """All-on-device training loop for link-constrained TPUs.

    The host-batch loop in ``train_denoiser`` ships ~0.6 MB over the wire
    every step — fine locally, a stall risk over the axon tunnel. Here the
    corpus is staged once (chunked), and each step fuses batch gather +
    dihedral augmentation + AWGN synthesis + the optimizer update in ONE
    jit; the link then only carries a loss scalar every ``log_every``
    steps and params at checkpoints. The corpus is a jit *argument* (a
    closed-over device constant would hit axon's UNIMPLEMENTED transfer
    path).

    ``scan_steps > 1`` wraps that fused step in a ``lax.scan`` so ONE
    dispatch advances many optimizer steps — the tunnel's ~150 ms/step
    round-trip latency otherwise dominates the ~10 ms/step compute
    (measured 5 steps/s without, compute-bound with). Checkpoints and
    loss logging then happen at megastep granularity.
    """
    rng = jax.random.PRNGKey(seed)
    in_nc = 2 if conditioned else 1
    ph, pw = patches.shape[1], patches.shape[2]
    if params is None:
        dummy = jnp.zeros((1, ph, pw, in_nc), jnp.float32)
        if ffdnet_style:
            params = model.init(rng, dummy[..., :1], jnp.asarray(0.1))
        else:
            params = model.init(rng, dummy)

    optimizer = make_optimizer(cfg, steps=steps)
    opt_state = optimizer.init(params)

    if ffdnet_style:
        def loss_fn(params, noisy, clean, sigma):
            pred = model.apply(params, noisy, sigma[:, 0, 0, 0])
            return 0.5 * jnp.mean((pred - clean) ** 2)
    else:
        loss_fn = make_loss_fn(model.apply, cfg.loss, conditioned)

    n = patches.shape[0]
    lo, hi = sigma if isinstance(sigma, tuple) else (sigma, sigma)

    @jax.jit
    def fused_step(params, opt_state, ema, corpus, key):
        k_idx, k_aug, k_sig, k_noise = jax.random.split(key, 4)
        idx = jax.random.randint(k_idx, (batch_size,), 0, n)
        clean = corpus[idx][..., None]  # (B, H, W, 1)
        modes = jax.random.randint(k_aug, (batch_size,), 0, 8)
        clean = jax.vmap(_dihedral)(clean, modes)
        sig = jax.random.uniform(
            k_sig, (batch_size, 1, 1, 1), jnp.float32, lo, hi
        )
        noisy = clean + sig * jax.random.normal(k_noise, clean.shape, jnp.float32)
        loss, grads = jax.value_and_grad(loss_fn)(params, noisy, clean, sig)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_decay is not None:
            ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema, params
            )
        return params, opt_state, ema, loss

    corpus = stage_to_device(patches)
    losses = []
    key = jax.random.PRNGKey(seed + 1)
    ema = params if ema_decay is not None else None
    out = lambda: ema if ema_decay is not None else params

    if scan_steps > 1:
        @jax.jit
        def mega_step(params, opt_state, ema, corpus, key):
            def body(carry, sub):
                params, opt_state, ema = carry
                params, opt_state, ema, loss = fused_step(
                    params, opt_state, ema, corpus, sub)
                return (params, opt_state, ema), loss

            subs = jax.random.split(key, scan_steps)
            (params, opt_state, ema), ls = jax.lax.scan(
                body, (params, opt_state, ema), subs)
            return params, opt_state, ema, ls

        done = 0
        while done < steps:
            k = min(scan_steps, steps - done)
            key, sub = jax.random.split(key)
            # the compiled scan always advances scan_steps; a short tail
            # would recompile, so overshoot the tail instead (harmless:
            # a few extra optimizer steps at the annealed lr)
            params, opt_state, ema, ls = mega_step(
                params, opt_state, ema, corpus, sub)
            ls = np.asarray(jax.device_get(ls))
            for j in range(0, scan_steps, max(1, log_every)):
                losses.append((done + j, float(ls[j])))
            done += scan_steps
            if ckpt_cb is not None and ckpt_every and (
                done % max(ckpt_every, scan_steps) < scan_steps
            ):
                ckpt_cb(done, jax.device_get(out()))
        if ckpt_cb is not None:
            ckpt_cb(done, jax.device_get(out()))
        return out(), losses

    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, ema, loss = fused_step(params, opt_state, ema, corpus, sub)
        if i % log_every == 0 or i == steps - 1:
            losses.append((i, float(loss)))
        if ckpt_cb is not None and ckpt_every and (i + 1) % ckpt_every == 0:
            ckpt_cb(i + 1, jax.device_get(out()))
    if ckpt_cb is not None and (not ckpt_every or steps % ckpt_every != 0):
        ckpt_cb(steps, jax.device_get(out()))
    return out(), losses
