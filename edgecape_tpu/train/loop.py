"""Jitted train step + epoch loop.

Behavioral spec: reference apis/train.py (EpochBasedRunner flow: per-epoch
episode reshuffle hook, eval hook every 25 epochs tracking best PCK,
checkpoint every 20 epochs, per-iteration loss/PCK logging) and the
masked-reconstruction branch of encoder_decoder.py:212-237.

TPU-first: one jitted train_step over a data-sharded batch (grad psum by
XLA); the frozen backbone runs inside the same jit under stop_gradient; the
reconstruction branch re-applies the decoder with its parameter subtree
stop-gradiented — the functional form of the reference's temporary
requires_grad toggling.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import Config
from ..data.mp100 import EpisodeBatch, MP100Dataset
from ..models import dinov2
from ..ops.heatmap import render_msra_jnp, render_udp_jnp
from ..models.edgecape import EdgeCape
from ..models.head import keypoint_losses, pck_accuracy
from . import checkpoint as ckpt_lib
from .state import make_optimizer


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_train_step(model: EdgeCape, tx, cfg: Config, backbone_cfg,
                    mesh=None):
    mcfg = cfg.model
    size = float(mcfg.image_size)
    bb_dtype = jnp.dtype(mcfg.compute_dtype)
    hs = mcfg.heatmap_size
    sigma = cfg.train_data.sigma
    if cfg.train_data.use_udp:
        render = render_udp_jnp
    elif getattr(cfg.train_data, "unbiased_encoding", False):
        from ..ops.heatmap import render_msra_unbiased_jnp
        render = render_msra_unbiased_jnp
    else:
        render = render_msra_jnp
    # The backbone is FROZEN (no grads flow into it), so the bf16 fused
    # Pallas path is valid under training; train_backbone_fast=True runs
    # it on TPU backends regardless of compute_dtype (features get
    # bf16-rounded; the head still trains at compute_dtype). Opting out
    # (or a non-TPU backend) keeps the bit-exact XLA backbone.
    bb_fast = (mcfg.train_backbone_fast
               and jax.default_backend() == "tpu")
    if bb_fast:
        # numerics-affecting default: record which backbone path produced
        # this run's checkpoints (train_backbone_fast=False keeps the
        # bit-exact XLA backbone at compute_dtype)
        print("[edgecape] train step: fused bf16 backbone active "
              "(model.train_backbone_fast=false for bit-exact fp32)")
    bb_flash = "auto" if bb_dtype == jnp.bfloat16 else False

    def extract(bb_params, imgs):
        if bb_fast:
            return dinov2.fast_forward(bb_params, imgs, backbone_cfg)
        return dinov2.extract_features(bb_params, imgs, backbone_cfg,
                                       dtype=bb_dtype, use_flash=bb_flash)

    if mesh is not None:
        # the frozen backbone is purely batch-parallel: run it in a manual
        # shard_map region so the Pallas fast path stays valid per-shard;
        # the head math (tiny, with batch-global loss normalizers) stays
        # in GSPMD land where XLA computes exact global semantics
        P = jax.sharding.PartitionSpec
        extract = jax.shard_map(extract, mesh=mesh,
                                in_specs=(P(), P("data")),
                                out_specs=P("data"), check_vma=False)

    def loss_fn(params, bb_params, batch, rng):
        r_enc, r_dec, r_rec = jax.random.split(rng, 3)
        b, s = batch["img_s"].shape[:2]
        imgs = jnp.concatenate(
            [batch["img_s"].reshape((b * s,) + batch["img_s"].shape[2:]),
             batch["img_q"]], axis=0)
        feats = extract(bb_params, imgs)
        gh, gw = feats.shape[1:3]
        feat_s = feats[:b * s].reshape(b, s, gh, gw, -1)
        feat_q = feats[b * s:]
        # support heatmaps rendered ON DEVICE from joints (13KB vs 26MB of
        # host-rendered maps per batch; bit-identical to the host renderer)
        target_s, weight_s = render(
            batch["joints_s"], batch["vis_s"], (hs, hs), (size, size),
            sigma)
        weight_s = weight_s[..., 0]
        mask_s = jnp.prod(weight_s, axis=1)                   # [B, K]

        enc = model.apply({"params": params}, feat_q, feat_s,
                          target_s, mask_s, batch["binary_adj"],
                          train=True, rngs={"dropout": r_enc},
                          method=EdgeCape.encode)
        outputs, _ = model.apply(
            {"params": params}, enc.kp_tokens, enc.img_tokens,
            enc.proposals, enc.adj, enc.hop_stack, enc.kp_valid,
            enc.img_pos, train=True, rngs={"dropout": r_dec},
            method=EdgeCape.decode)

        recon = None
        if mcfg.masked_supervision:
            masked_tokens = model.apply(
                {"params": params}, enc.kp_tokens, batch["rand_mask"],
                enc.kp_valid, method=EdgeCape.mask_tokens)
            sg = jax.lax.stop_gradient
            frozen = dict(params)
            frozen["decoder"] = jax.tree.map(sg, params["decoder"])
            _, recon_points = model.apply(
                {"params": frozen}, masked_tokens, sg(enc.img_tokens),
                sg(enc.proposals), enc.adj, enc.hop_stack, enc.kp_valid,
                sg(enc.img_pos), train=True, rngs={"dropout": r_rec},
                method=EdgeCape.decode)
            recon = recon_points[-1]

        weight = batch["weight_q"] * mask_s                   # [B, K]
        targets_norm = batch["joints_q"] / size
        losses = keypoint_losses(
            outputs, targets_norm, weight,
            proposals_for_loss=enc.proposals_for_loss,
            recon=recon,
            skeleton_loss_weight=mcfg.skeleton_loss_weight,
            similarity=enc.similarity, target_heatmap=batch["target_q"],
            with_heatmap_loss=mcfg.with_heatmap_loss,
            heatmap_loss_weight=mcfg.heatmap_loss_weight)
        total = sum(losses.values())
        acc = pck_accuracy(outputs[-1] * size, batch["joints_q"], weight,
                           jnp.full((b, 2), size))
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["acc_pose"] = acc
        return total, metrics

    def train_step(state: TrainState, bb_params, batch, rng):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, bb_params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), metrics

    return train_step


BATCH_KEYS = ("img_s", "img_q", "joints_s", "vis_s", "target_q",
              "weight_q", "joints_q", "binary_adj", "rand_mask")


def batch_to_device_arrays(batch: EpisodeBatch) -> dict:
    return {k: getattr(batch, k) for k in BATCH_KEYS}


class Trainer:
    """Epoch-based trainer with eval hook, best tracking, ckpt/resume."""

    def __init__(self, cfg: Config, train_ds: MP100Dataset,
                 val_ds: Optional[MP100Dataset] = None,
                 backbone_params=None, mesh=None,
                 log_fn=print):
        import dataclasses as _dc

        from ..config import resolve_use_flash
        # tri-state use_flash -> bool here so the head modules see a
        # concrete flag (None = auto: Pallas fused attention on TPU)
        cfg = _dc.replace(cfg, model=_dc.replace(
            cfg.model, use_flash=resolve_use_flash(cfg.model)))
        self.cfg = cfg
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.mesh = mesh
        self.log = log_fn
        self.model = EdgeCape(cfg.model)
        rng = jax.random.PRNGKey(cfg.train.seed)
        self.rng, init_rng, bb_rng = jax.random.split(rng, 3)

        if backbone_params is None:
            backbone_params = jax.jit(
                lambda r: dinov2.init_params(
                    r, image_size=cfg.model.image_size))(bb_rng)
        self.backbone_params = backbone_params

        g = cfg.model.image_size // cfg.model.patch_size
        k = cfg.model.max_kpt
        s = train_ds.num_shots
        hs = cfg.model.heatmap_size
        init = jax.jit(lambda r: self.model.init(
            {"params": r, "dropout": jax.random.PRNGKey(0)},
            jnp.zeros((1, g, g, cfg.model.backbone_dim)),
            jnp.zeros((1, s, g, g, cfg.model.backbone_dim)),
            jnp.zeros((1, s, k, hs, hs)), jnp.zeros((1, k)),
            jnp.zeros((1, k, k))))
        params = init(init_rng)["params"]

        # warm start (run.py load_from between curriculum stages)
        if cfg.load_from:
            loaded = ckpt_lib.load_checkpoint(cfg.load_from)
            params = ckpt_lib.merge_params(
                params, loaded.get("params", loaded))
            self.log(f"warm-started from {cfg.load_from}")

        steps_per_epoch = max(len(train_ds) // cfg.train.batch_size, 1)
        self.steps_per_epoch = steps_per_epoch
        self.tx, self.sched = make_optimizer(
            cfg.train, steps_per_epoch, params, cfg.model.model_freeze)
        self.state = TrainState(params=params,
                                opt_state=self.tx.init(params),
                                step=jnp.zeros((), jnp.int32))
        self.start_epoch = 0
        self.best_pck = -1.0
        self._eval_estimator = None

        # auto-resume (train.py:104-108)
        latest = None if cfg.resume_from else ckpt_lib.latest_checkpoint(
            cfg.work_dir)
        resume = cfg.resume_from or latest
        if resume:
            tree = ckpt_lib.load_checkpoint(resume, like={
                "params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": np.zeros((), np.int32),
                "epoch": 0, "best_pck": 0.0})
            self.state = TrainState(params=tree["params"],
                                    opt_state=tree["opt_state"],
                                    step=jnp.asarray(tree["step"]))
            self.start_epoch = int(tree["epoch"]) + 1
            self.best_pck = float(tree["best_pck"])
            self.log(f"resumed from {resume} at epoch {self.start_epoch}")

        step_fn = make_train_step(self.model, self.tx, cfg, dinov2.VIT_S14,
                                  mesh=mesh)
        self.multiprocess = mesh is not None and jax.process_count() > 1
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated
            rep, shb = replicated(mesh), batch_sharding(mesh)
            batch_shardings = {k: shb for k in BATCH_KEYS}
            state_sh = TrainState(params=jax.tree.map(lambda _: rep,
                                                      self.state.params),
                                  opt_state=jax.tree.map(
                                      lambda _: rep, self.state.opt_state),
                                  step=rep)
            self.train_step = jax.jit(
                step_fn, in_shardings=(state_sh, rep, batch_shardings, rep),
                donate_argnums=(0,))
            if self.multiprocess:
                # jit can auto-shard host arrays only within one process;
                # across processes state/backbone become global replicated
                # arrays once, batches per step (fit loop)
                from ..parallel import multihost
                self.backbone_params = multihost.replicate_global(
                    self.backbone_params, mesh)
                self.state = TrainState(
                    params=multihost.replicate_global(self.state.params,
                                                      mesh),
                    opt_state=multihost.replicate_global(
                        self.state.opt_state, mesh),
                    step=multihost.replicate_global(
                        jnp.asarray(self.state.step), mesh))
        else:
            self.train_step = jax.jit(step_fn, donate_argnums=(0,))

    # -------------------------------------------------------------- save
    def _save(self, name: str, epoch: int):
        import dataclasses

        from .. import __version__
        from ..parallel import multihost

        os.makedirs(self.cfg.work_dir, exist_ok=True)
        tree = {"params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": np.asarray(self.state.step),
                "epoch": epoch, "best_pck": self.best_pck}
        if self.multiprocess:
            # replicated global arrays -> host numpy; every process calls
            # orbax, which writes on the primary and barriers the rest
            tree = multihost.to_host(tree)
        ckpt_lib.save_checkpoint(os.path.join(self.cfg.work_dir, name),
                                 tree)
        if not multihost.is_primary():
            return
        # meta stamping (reference train.py:182-188 embeds version+config):
        # strings go in a sidecar json, not the array tree
        with open(os.path.join(self.cfg.work_dir, name + ".meta.json"),
                  "w") as f:
            json.dump({"version": __version__, "epoch": epoch,
                       "config": dataclasses.asdict(self.cfg)}, f,
                      default=str)
        ckpt_lib.write_latest(self.cfg.work_dir, name)

    # -------------------------------------------------------------- eval
    def _evaluate(self) -> float:
        from ..api import PoseEstimator
        from ..eval.runner import run_eval
        from ..parallel import multihost
        # Build the estimator once and swap the live params in on each
        # eval: the jitted forward closes over nothing, so reusing the
        # instance reuses its compilation cache across eval intervals.
        # Multi-process: each process evaluates its episode shard on its
        # local devices (run_eval shards + allgathers), so the estimator
        # gets host copies of the replicated global params.
        params = self.state.params
        backbone = self.backbone_params
        if self.multiprocess:
            params = multihost.to_host(params)
            backbone = multihost.to_host(backbone)
        if self._eval_estimator is None:
            # evaluate over the LOCAL devices (each process drives its
            # own chips; records meet in run_eval's allgather)
            from ..parallel.mesh import make_mesh
            local = jax.local_devices()
            eval_mesh = make_mesh(local) if len(local) > 1 else None
            self._eval_estimator = PoseEstimator(
                self.cfg, backbone_params=backbone,
                head_params=params, mesh=eval_mesh)
        est = self._eval_estimator
        est.head_params = params
        est.backbone_params = backbone
        res = run_eval(self.val_ds, est,
                       batch_size=max(self.cfg.train.batch_size, 1),
                       res_folder=self.cfg.work_dir, progress=False,
                       cache_supports=True)
        return float(res["PCK"])

    # --------------------------------------------------------------- fit
    def fit(self) -> TrainState:
        from ..data.loader import Prefetcher

        from ..parallel import multihost

        cfg = self.cfg
        masking = (cfg.model.masking_ratio
                   if cfg.model.masked_supervision else 0.0)
        log_path = os.path.join(cfg.work_dir, "train_log.jsonl")
        os.makedirs(cfg.work_dir, exist_ok=True)
        tb = None
        if cfg.train.tensorboard and multihost.is_primary():
            # reference TensorboardLoggerHook parity
            # (configs/train/1shot_split1.py:27-32)
            from ..utils.tb_writer import SummaryWriter
            tb = SummaryWriter(os.path.join(cfg.work_dir, "tf_logs"))
        # multi-process: identical batch PLANS everywhere, but each
        # process collates only its row slice (host work scales with
        # process count); slices concatenate into the global batch below
        shard = ((jax.process_index(), jax.process_count())
                 if self.multiprocess else None)
        loader = Prefetcher(self.train_ds, cfg.train.batch_size,
                            shuffle=True, masking_ratio=masking,
                            drop_last=True,
                            num_workers=cfg.train.num_workers,
                            seed=cfg.train.seed, shard=shard)

        for epoch in range(self.start_epoch, cfg.train.total_epochs):
            t0 = time.time()
            agg, n_agg, n_it = {}, 0, 0
            for batch in loader.epoch():
                self.rng, step_rng = jax.random.split(self.rng)
                arrays = batch_to_device_arrays(batch)
                if self.multiprocess:
                    # the sharded Prefetcher produced only this process's
                    # row block; blocks concatenate into the global batch
                    from ..parallel import multihost
                    arrays = multihost.shard_batch_global(
                        arrays, self.mesh, already_local=True)
                self.state, metrics = self.train_step(
                    self.state, self.backbone_params, arrays, step_rng)
                n_it += 1
                if n_it % cfg.train.log_interval == 0 or n_it == 1:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    for k, v in metrics.items():
                        agg[k] = agg.get(k, 0.0) + v
                    n_agg += 1
                    self.log(f"epoch {epoch} it {n_it}/"
                             f"{self.steps_per_epoch} "
                             + " ".join(f"{k}={v:.4f}"
                                        for k, v in sorted(metrics.items())))
                    if tb is not None:
                        step = int(self.state.step)
                        for k, v in metrics.items():
                            tb.add_scalar(f"train/{k}", v, step)
                        tb.add_scalar("train/lr", float(self.sched(step)),
                                      step)
            # after_train_epoch: reshuffle episode pairs
            # (ShufflePairedSamplesHook equivalent)
            self.train_ds.resample_episodes()

            entry = {"epoch": epoch, "time": round(time.time() - t0, 2),
                     "lr": float(self.sched(int(self.state.step)))}
            if n_agg:  # epoch-mean of the sampled train metrics
                entry.update({f"train_{k}": round(v / n_agg, 6)
                              for k, v in sorted(agg.items())})
            if self.val_ds is not None and \
                    (epoch + 1) % cfg.train.eval_interval == 0:
                pck = self._evaluate()
                entry["val_pck"] = pck
                if tb is not None:
                    tb.add_scalar("val/PCK", pck, int(self.state.step))
                if pck > self.best_pck:
                    self.best_pck = pck
                    self._save(f"best_PCK_epoch_{epoch + 1}", epoch)
                self.log(f"epoch {epoch} val PCK={pck:.4f} "
                         f"(best {self.best_pck:.4f})")
            if (epoch + 1) % cfg.train.ckpt_interval == 0 or \
                    epoch + 1 == cfg.train.total_epochs:
                self._save(f"epoch_{epoch + 1}", epoch)
            if multihost.is_primary():
                with open(log_path, "a") as f:
                    f.write(json.dumps(entry) + "\n")
            if tb is not None:
                tb.flush()
        if tb is not None:
            tb.close()
        return self.state
