"""GSPMD data-parallel trainer: AdamW + grad clip + warmup-cosine.

Replaces the reference's mmcv Runner + DDP stack (tools/train.py:101-318):
  - optimizer: AdamW lr=2e-4 wd=0.01, grad clip 35 (cfg
    srfdet_voxel_nusc_L.py:337-346)
  - schedule: linear warmup (cfg.optim.warmup_iters, ratio 1/3) into cosine
    annealing to min_lr_ratio=1e-3 (cfg :348-353)
  - freeze_img (srfdet.py:83-89) and freeze_lidar_components
    (tools/train.py:221-276) become optax.masked zero-updates plus
    BN-in-eval handled by the modules' train flags
  - DDP gradient all-reduce / SyncBN / reduce_mean: implicit — the loss is a
    global-batch reduction under jit over a data mesh (see parallel/mesh.py).

The train step is a single jit-compiled function; batches arrive sharded on
the leading dim, parameters replicated.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict
from jax.flatten_util import ravel_pytree

from ..config import SRFDetConfig
from ..models.detector import SRFDet
from ..models.losses import srfdet_losses


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(optim, total_steps: int) -> optax.Schedule:
    """Linear warmup -> cosine anneal (mmcv CosineAnnealingLrUpdaterHook).

    mmcv evaluates the cosine at the ABSOLUTE iteration over max_iters
    (warmup only overrides the early values), so after warmup the lr
    resumes slightly below base lr rather than restarting the cosine —
    matched here for reproducible reference training curves."""
    warmup = optax.linear_schedule(
        init_value=optim.lr * optim.warmup_ratio,
        end_value=optim.lr,
        transition_steps=optim.warmup_iters)
    min_lr = optim.lr * optim.min_lr_ratio

    def schedule(count):
        frac = jnp.clip(count / max(total_steps, 1), 0.0, 1.0)
        cos = min_lr + (optim.lr - min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * frac))
        return jnp.where(count < optim.warmup_iters, warmup(count), cos)

    return schedule


def freeze_mask(params, cfg: SRFDetConfig):
    """True = trainable. Mirrors freeze_img (srfdet.py:83-89),
    freeze_lidar_components (tools/train.py:221-276: every `pts_*` module)
    and the image backbone's stage-wise frozen_stages
    (reference vovnet.py:353-366 / mmdet ResNet)."""
    frozen_prefixes = []
    if cfg.optim.freeze_img:
        frozen_prefixes.append(("img_backbone",))
    if cfg.optim.freeze_lidar:
        frozen_prefixes += [("pts_voxel_encoder",), ("pts_middle_encoder",),
                            ("pts_backbone",), ("pts_neck",),
                            # reference also freezes the head's optional
                            # BEV encoder (train.py:229-234)
                            ("bbox_head", "lidar_encoder")]

    # frozen_stages=N freezes the stem PLUS stages 1..N — reference
    # vovnet.py:353-364 (`range(1, frozen_stages + 1)` over stage{i+1})
    # and mmdet ResNet (same loop over layer{i})
    fs = cfg.img.frozen_stages if (cfg.img and not cfg.optim.freeze_img) \
        else 0
    stage_prefixes = []
    if fs >= 1:
        stage_prefixes += [("img_backbone", "stem"),      # VoVNet stems
                           ("img_backbone", "Conv_0"),    # ResNet root
                           ("img_backbone", "BatchNorm_0")]
        for s in range(1, fs + 1):
            stage_prefixes.append(("img_backbone", f"stage{s + 1}_"))
            stage_prefixes.append(("img_backbone", f"layer{s}_"))

    # norm_frozen: every BN scale/bias in the image backbone stays fixed
    # (mmdet norm_cfg requires_grad=False — waymo_LC R101,
    # dvoxel_waymo_LC.py:65), independent of frozen_stages
    bn_frozen = bool(cfg.img and cfg.img.norm_frozen)

    def trainable(path, _):
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        for pre in frozen_prefixes:
            if keys[:len(pre)] == pre:
                return False
        for pre in stage_prefixes:
            if len(keys) >= len(pre) and \
                    keys[:len(pre) - 1] == pre[:-1] and \
                    keys[len(pre) - 1].startswith(pre[-1]):
                return False
        if bn_frozen and keys[:1] == ("img_backbone",) and \
                any(k.startswith("BatchNorm") for k in keys):
            return False
        return True

    return jax.tree_util.tree_map_with_path(trainable, params)


class FlatAdamWState(NamedTuple):
    """AdamW moments as ONE raveled vector each (not per-leaf trees)."""
    count: jnp.ndarray   # () int32
    mu: jnp.ndarray      # (P,) first moment
    nu: jnp.ndarray      # (P,) second moment


def _zero_frozen(tree, mask):
    return jax.tree_util.tree_map(
        lambda x, t: x if t else jnp.zeros_like(x), tree, mask)


def make_optimizer(cfg: SRFDetConfig, total_steps: int
                   ) -> optax.GradientTransformation:
    """Global-norm clip + AdamW over one raveled parameter vector.

    Functionally identical to
    ``optax.chain(clip_by_global_norm, adamw(schedule, wd))`` wrapped in a
    freeze-mask ``multi_transform`` (reference AdamW grad_clip=35, cfg
    srfdet_voxel_nusc_L.py:337-346), but the update math runs as a handful
    of large fused kernels over a single (P,) vector instead of ~10
    elementwise HLOs x n_leaves, and the optimizer state is two buffers
    instead of 2 x n_leaves.  On the tunneled TPU backend per-buffer
    dispatch overhead made the per-leaf form cost ~200 ms/step at 179
    param leaves (PERF.md session 8); the raveled form removes 356 state
    buffers from every train-step call.

    Freeze-mask semantics match the multi_transform form exactly: frozen
    leaves' grads are zeroed BEFORE the clip norm (the norm spans
    trainable leaves only) and their updates are exact zeros, so frozen
    parameters stay bit-identical.
    """
    schedule = make_lr_schedule(cfg.optim, total_steps)
    b1, b2, eps = 0.9, 0.999, 1e-8
    wd = cfg.optim.weight_decay
    clip = cfg.optim.grad_clip
    needs_mask = cfg.optim.freeze_img or cfg.optim.freeze_lidar or \
        (cfg.img is not None and
         (cfg.img.frozen_stages > 0 or cfg.img.norm_frozen))

    def init(params):
        flat, _ = ravel_pytree(params)
        return FlatAdamWState(count=jnp.zeros((), jnp.int32),
                              mu=jnp.zeros_like(flat),
                              nu=jnp.zeros_like(flat))

    def update(grads, state, params):
        if params is None:
            raise ValueError("flat AdamW requires params (weight decay)")
        mask = freeze_mask(params, cfg) if needs_mask else None
        if mask is not None:
            grads = _zero_frozen(grads, mask)
        g, unravel = ravel_pytree(grads)
        p, _ = ravel_pytree(params)
        # optax.clip_by_global_norm: select, no epsilon
        gn = jnp.sqrt(jnp.sum(g * g))
        g = jnp.where(gn < clip, g, g * (clip / gn))
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * (g * g)
        c = state.count + 1
        mhat = mu / (1.0 - b1 ** c)
        nhat = nu / (1.0 - b2 ** c)
        # optax.adamw: -lr * (m / (sqrt(v) + eps) + wd * p); the schedule
        # is evaluated at the pre-increment count like scale_by_schedule
        upd = (-schedule(state.count)) * \
            (mhat / (jnp.sqrt(nhat) + eps) + wd * p)
        updates = unravel(upd)
        if mask is not None:
            updates = _zero_frozen(updates, mask)
        return updates, FlatAdamWState(count=c, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def create_train_state(cfg: SRFDetConfig,
                       rng: jax.Array,
                       sample_batch: Dict[str, jnp.ndarray],
                       total_steps: int = 100000
                       ) -> Tuple[SRFDet, TrainState,
                                  optax.GradientTransformation]:
    model = SRFDet(cfg)
    # jit the init: eager (op-by-op) initialization compiles thousands of
    # micro-programs and takes minutes; one jitted program compiles once
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        rng, sample_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg, total_steps)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params))
    return model, state, tx


def _frozen_top_keys(cfg: SRFDetConfig):
    keys = []
    if cfg.optim.freeze_img:
        keys.append("img_backbone")
    if cfg.optim.freeze_lidar:
        keys += ["pts_voxel_encoder", "pts_middle_encoder", "pts_backbone",
                 "pts_neck"]
    return keys


def make_train_step(model: SRFDet, tx: optax.GradientTransformation,
                    cfg: SRFDetConfig, mesh=None) -> Callable:
    """One SGD step. batch must contain points(+mask), optional images, and
    gt_boxes (B, G, 7|9) / gt_labels (B, G) / gt_mask (B, G).

    mesh: optional 1-D data mesh.  When given (and > 1 device), the grad
    program runs under `jax.shard_map` over the data axis instead of plain
    GSPMD: each device runs the WHOLE per-sample pipeline on its local
    batch shard — the flat-batched sparse-encoder gathers/scatters (keys
    b*cap + r) partition trivially because B is the LOCAL batch, where
    GSPMD must replicate them (it cannot prove batch-folded indices stay
    within a shard; measured per-device grad FLOPs grow ~linearly with
    mesh size on the jit path, tests/test_train.py::
    test_dp_scaling_per_device_flops_flat).  Cross-device semantics stay
    the reference's DDP: BatchNorms psum their batch stats (NaiveSyncBN),
    loss sums/normalizers psum (reduce_mean + sync_cls_avg_factor), and
    the grads psum (gradient all-reduce).  Dropout/GridMask rngs fold in
    the device index, so masks decorrelate across devices (the GSPMD path
    shards one global mask instead — statistically equivalent, not
    bit-identical).

    cfg.optim.accum_steps > 1 splits the batch into that many microbatches
    and accumulates gradients under a single jitted `lax.scan` before the
    one optimizer update — peak activation memory drops ~accum_steps-fold,
    reproducing the reference's 8-GPU global batch (dist_train.sh, 2
    samples/GPU) on fewer chips.  The split is STRIDED on the batch axis
    (microbatch i takes rows i, a+i, 2a+i, ...) so each microbatch spans
    every device of a data mesh evenly.  Semantics match DDP-without-
    avg_factor-sync: each microbatch normalizes its losses by its own
    positives, and BN batch stats update once per microbatch (sequential,
    like consecutive steps)."""
    frozen_keys = _frozen_top_keys(cfg)
    accum = max(int(cfg.optim.accum_steps), 1)

    def loss_fn(params, batch_stats, batch, rngs):
        (logits, boxes), updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, train=True, mutable=["batch_stats"], rngs=rngs)
        losses = srfdet_losses(
            logits, boxes, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_mask"], cfg.loss, cfg.ota,
            decoder_num_heads=cfg.head.num_heads)
        total = sum(losses.values())
        return total, (losses, updates.get("batch_stats", FrozenDict()))

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def _rngs(rng):
        return {"dropout": jax.random.fold_in(rng, 0),
                "grid_mask": jax.random.fold_in(rng, 1)}

    def _grads_single(state, batch, rng):
        (total, (losses, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, batch, _rngs(rng))
        return total, losses, new_bs, grads

    def _grads_accum(state, batch, rng):
        def split(x):
            b = x.shape[0]
            if b % accum:
                raise ValueError(
                    f"batch dim {b} not divisible by accum_steps={accum}")
            # strided: microbatch i = rows i, a+i, ... (device-spanning)
            return jnp.swapaxes(
                x.reshape((b // accum, accum) + x.shape[1:]), 0, 1)

        micro = jax.tree_util.tree_map(split, batch)
        rng_seq = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
            jnp.arange(accum, dtype=jnp.uint32))
        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        def body(carry, xs):
            bs, gsum = carry
            mb, r = xs
            (total, (losses, new_bs)), grads = grad_fn(
                state.params, bs, mb, _rngs(r))
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            return (new_bs, gsum), (total, losses)

        (new_bs, gsum), (totals, losses_seq) = jax.lax.scan(
            body, (state.batch_stats, zeros), (micro, rng_seq))
        grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
        losses = jax.tree_util.tree_map(lambda l: jnp.mean(l, axis=0),
                                        losses_seq)
        return jnp.mean(totals), losses, new_bs, grads

    def grad_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                  rng: jax.Array):
        if accum == 1:
            total, losses, new_bs, grads = _grads_single(state, batch, rng)
        else:
            total, losses, new_bs, grads = _grads_accum(state, batch, rng)
        # frozen branches keep their pretrained BN running stats
        # (reference fix_bn in freeze_lidar_components, tools/train.py:245;
        # the forward also runs them in eval mode — detector.py pts_train)
        if frozen_keys and new_bs:
            new_bs = dict(new_bs)
            for k in frozen_keys:
                if k in state.batch_stats:
                    new_bs[k] = state.batch_stats[k]
            # freeze_lidar also freezes the head's optional BEV encoder
            # (reference train.py:229-234) — restore its nested stats
            if cfg.optim.freeze_lidar and \
                    "bbox_head" in state.batch_stats and \
                    "lidar_encoder" in state.batch_stats["bbox_head"]:
                bh = dict(new_bs.get("bbox_head", {}))
                bh["lidar_encoder"] = \
                    state.batch_stats["bbox_head"]["lidar_encoder"]
                new_bs["bbox_head"] = bh
            new_bs = FrozenDict(new_bs)
        return total, losses, new_bs, grads

    def apply_step(state: TrainState, new_bs, grads):
        grad_norm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bs, opt_state=new_opt)
        return new_state, grad_norm

    # TWO dispatched programs, not one.  Measured on a v5e (PERF.md round-2
    # session 8): a program whose output is the RAW grad tree streams at
    # 681 ms, and adding ANY elementwise consumer of those grads inside the
    # SAME program — full AdamW, fused SGD (p - lr*g), even `g * 2` with no
    # params involved — costs +200 ms, while the identical optimizer math
    # as its own program costs ~3 ms (flat raveled AdamW, probe_flat_opt).
    # Scalar reductions of the grads (global-norm) are free in-program.
    # XLA's buffer assignment for the 100k-line backward loses the in-place
    # grad-accumulation aliasing when the accumulators feed an elementwise
    # epilogue instead of being outputs; splitting the step restores it.
    # The device executes stream-ordered, so the split costs one extra
    # (async) dispatch and 92 MB of grad I/O, nothing else; numerics are
    # bit-identical to the fused form.
    use_sm = False
    if mesh is not None:
        from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
        use_sm = (DATA_AXIS in mesh.axis_names
                  and mesh.shape[DATA_AXIS] > 1
                  and MODEL_AXIS not in mesh.axis_names)
    if use_sm:
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import data_sync
        try:
            from jax import shard_map
        except ImportError:                      # older jax
            from jax.experimental.shard_map import shard_map

        def _sharded_grad_step(state, batch, rng):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
            with data_sync(DATA_AXIS):           # trace-time: psums on
                return grad_step(state, batch, rng)

        # NO explicit grad psum: with the vma checker on (the default),
        # the replicated params are pvary'd into the device-varying batch
        # computation and pvary's TRANSPOSE is psum — jax.grad inside
        # shard_map therefore already returns the cross-device all-reduced
        # (DDP) gradient.  Adding our own psum double-counts by n_dev
        # (measured: grad_norm exactly 8x at n_dev=8 vs the GSPMD path).
        grad_prog = jax.jit(shard_map(
            _sharded_grad_step, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P()),
            out_specs=(P(), P(), P(), P())))
    else:
        grad_prog = jax.jit(grad_step)
    apply_prog = jax.jit(apply_step, donate_argnums=(0, 1, 2))

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array):
        total, losses, new_bs, grads = grad_prog(state, batch, rng)
        new_state, grad_norm = apply_prog(state, new_bs, grads)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = grad_norm
        return new_state, metrics

    # exposed for AOT compilation (multi-host workers compile before the
    # coordination barrier so compile skew cannot blow collective deadlines)
    train_step.grad_prog = grad_prog
    train_step.apply_prog = apply_prog
    return train_step


def make_eval_step(model: SRFDet) -> Callable:
    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, method=SRFDet.predict)
    return jax.jit(eval_step)
