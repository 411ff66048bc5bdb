"""Linear/attentive-probe driver — the main_linprobe.py equivalent.

Full experiment lifecycle (reference main_linprobe.py:184-777): mesh setup,
transforms + dataset dispatch, sharded loaders, backbone build + pretrained
checkpoint conversion, head grafting, freeze rule, optimizer, resume,
epoch loop with eval / head-only checkpointing / early stop, and the four
logging sinks. ``--knn_eval`` and ``--eval`` short-circuit like the reference.
"""
from __future__ import annotations

import datetime
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ep_tpu.configs import TrainConfig, get_args_parser, config_from_args
from ep_tpu.data.datasets import build_datasets
from ep_tpu.data.loader import build_loaders
from ep_tpu.data.transforms import build_transforms
from ep_tpu.models.assembly import build_backbone_config, ProbeModel
from ep_tpu.parallel.mesh import (init_distributed, make_mesh,
                                  is_main_process, set_current_mesh)
from ep_tpu.runtime.checkpoint import (find_auto_resume, load_model, save_model)
from ep_tpu.train.engine import (evaluate, extract_features, knn_classifier,
                                 train_one_epoch)
from ep_tpu.train.lars import build_optimizer
from ep_tpu.train.schedule import make_lr_fn, resolve_lr
from ep_tpu.train.state import count_params, create_train_state
from ep_tpu.train.steps import make_eval_step, make_extract_step, make_train_step
from ep_tpu.utils.logging import (MetricLogger, TrainingLogFile, make_tb_writer,
                                  maybe_setup_wandb, setup_for_distributed)


def main(cfg: TrainConfig) -> dict:
    if cfg.device == "cpu":
        # honored before first backend touch; lets --device cpu force a CPU
        # run even where a TPU plugin pins jax_platforms
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backends already initialized (e.g. under pytest)
    if cfg.debug_nans:
        # pinpoints the op that produced a NaN, instead of the loss-level
        # abort (SURVEY.md §5 failure-detection plan)
        jax.config.update("jax_debug_nans", True)
    init_distributed(cfg)
    setup_for_distributed(is_main_process())

    log_file = TrainingLogFile(cfg.output_dir)
    log_file.write_header(cfg)

    print(f"config: {cfg}")

    rng = jax.random.key(cfg.seed + jax.process_index())
    np.random.seed(cfg.seed + jax.process_index())

    mesh = make_mesh(cfg.mesh_data, cfg.mesh_model)
    set_current_mesh(mesh)  # opt kernel dispatch (attn_impl=auto) onto it
    data_axis = mesh.shape["data"]
    if cfg.batch_size % data_axis != 0:
        raise ValueError(
            f"--batch_size {cfg.batch_size} must be divisible by the data "
            f"mesh axis ({data_axis} devices); pick a multiple of {data_axis}")

    # --- data ----------------------------------------------------------------
    device_aug = None
    if cfg.device_aug:
        if cfg.train_aug == "aimv2":
            raise ValueError("--device_aug implements the default RRC+flip "
                             "recipe only; --train_aug aimv2 (jitter + "
                             "AutoAugment) needs the host pipeline")
        if cfg.cache_features:
            # cached mode encodes each image once (or K times) — the host
            # aug cost is already amortized away, so device aug buys
            # nothing there; keep the host transforms
            print("| --device_aug is a no-op with --cache_features; "
                  "using host transforms")
            cfg = cfg.replace(device_aug=False)
    if cfg.device_aug:
        from ep_tpu.data.device_aug import DeviceAug, build_staging_transforms
        device_aug = DeviceAug.from_cfg(cfg)
        transform_train, transform_val = build_staging_transforms(cfg)
        print(f"| device-side augmentation: stage {device_aug.stage_size} -> "
              f"crop {device_aug.out_size} on the TPU (u8 host transfer)")
    else:
        transform_train, transform_val = build_transforms(cfg)
    dataset_train, dataset_val = build_datasets(cfg)
    if cfg.device_aug and cfg.device_aug_cache:
        # stage-once memmap cache: epochs ≥2 never re-decode (the staging
        # resize itself is no cheaper than the host RRC — the win IS the
        # cache; data/device_aug.py::StagedImageCache)
        from ep_tpu.data.device_aug import IdentityTransform, StagedImageCache
        dataset_train = StagedImageCache(
            dataset_train, transform_train, cfg.device_aug_cache, "train")
        dataset_val = StagedImageCache(
            dataset_val, transform_val, cfg.device_aug_cache, "val")
        transform_train = transform_val = IdentityTransform()
    print(dataset_train)
    print(dataset_val)
    loader_train, loader_val = build_loaders(
        cfg, dataset_train, dataset_val, transform_train, transform_val,
        num_processes=jax.process_count(), process_index=jax.process_index(),
    )

    eff_batch_size = cfg.batch_size * cfg.accum_iter * jax.process_count()
    cfg = cfg.replace(eff_batch_size=eff_batch_size)

    if is_main_process() and cfg.output_dir and not cfg.eval and not cfg.knn_eval:
        maybe_setup_wandb(cfg.output_dir, cfg, job_type="linprobe_v1",
                          run_name_suffix=cfg.suffix)
    log_writer = (make_tb_writer(cfg.output_dir)
                  if not cfg.eval and not cfg.knn_eval else None)

    # --- model ---------------------------------------------------------------
    backbone_cfg = build_backbone_config(cfg)
    model = ProbeModel(backbone_cfg, cfg)
    dummy = jnp.zeros((2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    variables = model.init(rng, dummy, train=True)

    if cfg.finetune:
        from ep_tpu.convert.torch_vit import load_pretrained_backbone
        variables = load_pretrained_backbone(cfg, backbone_cfg, variables)
    if cfg.oracle_ckpt:
        from ep_tpu.convert.torch_vit import load_oracle
        variables = load_oracle(cfg, backbone_cfg, variables)

    tx = build_optimizer(cfg.optimizer, cfg.weight_decay,
                         mu_dtype=jnp.bfloat16 if cfg.mu_bf16
                         else jnp.float32)
    if cfg.accum_iter > 1:
        # gradient accumulation (engine_finetune.py:72-77): grads average
        # over accum_iter microsteps, the parameter update fires at the
        # boundary (optax.MultiSteps emits zero updates in between)
        import optax
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_iter)
    if cfg.int8_mlp:
        from ep_tpu.models.vit import int8_mlp_inactive_reason
        reason = int8_mlp_inactive_reason(backbone_cfg)
        if reason is not None:
            print(f"| WARNING: --int8_mlp is a NO-OP for this run — {reason}"
                  "; the MLP stays bf16")
    state = create_train_state(variables, tx, cfg.finetuning)
    if not cfg.finetuning and cfg.amp == "bfloat16":
        # probing never updates the backbone: keep it in the compute dtype
        # (halves weight HBM reads per step; see train/state.cast_frozen)
        from ep_tpu.train.state import cast_frozen
        state = cast_frozen(state, jnp.bfloat16)
    del variables

    n_parameters = count_params(state.trainable)
    print("number of params (M): %.2f" % (n_parameters / 1.0e6))
    print("base lr: %.2e" % cfg.blr)
    print("actual lr: %.2e" % resolve_lr(cfg))
    print("effective batch size: %d" % eff_batch_size)
    log_file.write_setup(eff_batch_size, n_parameters)

    # --- resume --------------------------------------------------------------
    if cfg.auto_resume and not cfg.resume and cfg.output_dir:
        found = find_auto_resume(cfg.output_dir)
        if found:
            cfg = cfg.replace(resume=found)
            print(f"[auto-resume] Will load {found}")
        else:
            print("[auto-resume] No checkpoint found - starting fresh")
    state, start_epoch, _ = load_model(cfg, state)

    lr_fn = make_lr_fn(cfg, steps_per_epoch=max(len(loader_train), 1))
    train_step = make_train_step(model, tx, lr_fn, mesh, device_aug)
    eval_step = make_eval_step(model, mesh, device_aug)

    if cfg.aot_cache:
        # serialized-executable cache: repeat runs of the same computation
        # skip the multi-minute remote compile (runtime/aot_cache.py). The
        # key carries every compute-relevant knob — notably the LR-schedule
        # constants, which are baked into the compiled step as literals.
        import dataclasses
        from ep_tpu.runtime.aot_cache import AOTCache
        skip = {"output_dir", "data_path", "resume", "finetune",
                "oracle_ckpt", "suffix", "num_workers", "auto_resume",
                "device", "log_dir", "aot_cache", "pin_mem", "dist_eval",
                "dataloader_affinity_hack", "start_epoch"}
        key = repr(sorted(
            (k, str(v)) for k, v in dataclasses.asdict(cfg).items()
            if k not in skip)) + f":spe{max(len(loader_train), 1)}"
        ac = AOTCache(cfg.aot_cache)
        train_step = ac.wrap(train_step, "train:" + key)
        eval_step = ac.wrap(eval_step, "eval:" + key)

    # --- feature-cache fast path (our extension; SURVEY.md §7 decision 1) -----
    if cfg.cache_features and not cfg.finetuning and not cfg.eval \
            and not cfg.knn_eval:
        from ep_tpu.data.loader import DataLoader
        from ep_tpu.models.vit import VisionTransformer, remap_features
        from ep_tpu.poolings.registry import ProbeHead
        from ep_tpu.train.feature_cache import (CachedFeatureLoader,
                                                extract_split, make_head_steps)

        mode = remap_features(cfg.cls_features)
        backbone = VisionTransformer(backbone_cfg)
        bb_params = {"params": state.frozen["backbone"]}

        # params as an argument, not a closure: closed-over device arrays
        # get embedded as HLO constants (CLAUDE.md perf notes)
        @jax.jit
        def _bb_apply(params, images):
            feats, _, _ = backbone.apply(params, images, mode,
                                         cfg.return_block)
            return feats

        def backbone_apply(images):
            return _bb_apply(bb_params, images)

        K = max(1, cfg.cache_augs)
        print(f"[cache] extracting frozen features (train x{K} aug "
              f"draw{'s' if K > 1 else ''} + val)")
        # per-process sharding like build_loaders: every host feeds its own
        # slice of the dataset; extract_split allgathers the global batch
        ex_train = DataLoader(dataset_train, cfg.batch_size, transform_train,
                              shuffle=False, drop_last=False,
                              num_workers=cfg.num_workers,
                              num_processes=jax.process_count(),
                              process_index=jax.process_index())
        # K epoch-seeded augmentation draws per image (--cache_augs): the
        # loader iterates in dataset order (shuffle=False), so labels align
        # across variants and only the crop rng changes with the epoch
        variants = []
        for k in range(K):
            ex_train.set_epoch(k)
            f_k, labels_tr = extract_split(
                backbone_apply, ex_train, mesh, cfg.output_dir,
                "train" if K == 1 else f"train_aug{k}")
            variants.append(f_k)
        feats_tr = variants if K > 1 else variants[0]
        feats_va, labels_va = extract_split(
            backbone_apply, loader_val, mesh, cfg.output_dir, "val")
        print(f"[cache] train {variants[0].shape}"
              f"{f' x{K} augs' if K > 1 else ''} val {feats_va.shape}")
        loader_train = CachedFeatureLoader(feats_tr, labels_tr, cfg.batch_size,
                                           shuffle=True, drop_last=True,
                                           seed=cfg.seed)
        loader_val = CachedFeatureLoader(feats_va, labels_va, cfg.batch_size,
                                         shuffle=False, drop_last=False)
        head = ProbeHead(cfg, backbone_cfg.embed_dim,
                         backbone_cfg.num_patches, dtype=backbone_cfg.dtype)
        lr_fn = make_lr_fn(cfg, steps_per_epoch=max(len(loader_train), 1))
        train_step, eval_step = make_head_steps(head, mesh, tx, lr_fn)

    # --- kNN / eval-only modes -------------------------------------------------
    if cfg.knn_eval:
        extract_step = make_extract_step(model, mesh, device_aug)
        train_feats, train_labels = extract_features(
            extract_step, state, loader_train, mesh)
        test_feats, test_labels = extract_features(
            extract_step, state, loader_val, mesh)
        print(f"Train features shape: {train_feats.shape}")
        print(f"Test features shape: {test_feats.shape}")
        train_feats /= np.linalg.norm(train_feats, axis=1, keepdims=True) + 1e-12
        test_feats /= np.linalg.norm(test_feats, axis=1, keepdims=True) + 1e-12
        ks = [k for k in [5, 10, 15, 20, 50, 100, 200]
              if k <= len(train_labels)]
        from ep_tpu.train.engine import knn_classifier_multi
        # one device pass computes the top-max(k) neighbor list; per-k
        # votes run on host (the per-k loop would recompile top_k each
        # time through the remote-compile relay)
        results = knn_classifier_multi(
            train_feats, train_labels, test_feats, test_labels, ks,
            T=cfg.T, num_classes=cfg.nb_classes)
        for k in ks:
            top1, top5 = results[k]
            print(f"{k}-NN classifier result: Top1: {top1}, Top5: {top5}")
        return {"knn": results}

    if cfg.eval:
        test_stats = evaluate(eval_step, state, loader_val, mesh, cfg)
        print(f"Accuracy of the network on the {len(dataset_val)} "
              f"test images: {test_stats['acc1']:.1f}%")
        return test_stats

    # --- training loop ---------------------------------------------------------
    print(f"Start training for {cfg.epochs} epochs")
    start_time = time.time()
    max_accuracy = 0.0
    es_best, es_stale = -1.0, 0
    test_stats = {"acc1": 0.0, "acc5": 0.0, "loss": float("inf")}

    from ep_tpu.runtime.profiler import trace
    for epoch in range(start_epoch, cfg.epochs):
        loader_train.set_epoch(epoch)
        with trace(cfg.profile_dir if epoch == start_epoch else ""):
            state, train_stats = train_one_epoch(
                train_step, state, loader_train, mesh, epoch, cfg, log_writer)
        test_stats = evaluate(eval_step, state, loader_val, mesh, cfg)

        log_stats = {**{f"train_{k}": v for k, v in train_stats.items()},
                     **{f"test_{k}": v for k, v in test_stats.items()},
                     "epoch": epoch, "n_parameters": n_parameters}
        if cfg.output_dir:
            save_model(cfg, epoch, state, log_stats)

        print(f"Accuracy of the network on the {len(dataset_val)} "
              f"test images: {test_stats['acc1']:.1f}%")
        max_accuracy = max(max_accuracy, test_stats["acc1"])
        print(f"Max accuracy: {max_accuracy:.2f}%")

        log_file.write_epoch(epoch, train_stats, test_stats)
        if log_writer is not None:
            pf = f"test_v1_{cfg.cls_features}"
            log_writer.add_scalar(f"{pf}/train_acc1", train_stats["acc1"], epoch)
            log_writer.add_scalar(f"{pf}/train_loss", train_stats["loss"], epoch)
            log_writer.add_scalar(f"{pf}/test_acc1", test_stats["acc1"], epoch)
            log_writer.add_scalar(f"{pf}/test_acc5", test_stats["acc5"], epoch)
            log_writer.add_scalar(f"{pf}/test_loss", test_stats["loss"], epoch)

        # early stop on a validation plateau; metrics are already global, so
        # every process decides identically (main_linprobe.py:731-747)
        if cfg.early_stop:
            if test_stats["acc1"] > es_best + cfg.early_stop_min_delta:
                es_best, es_stale = test_stats["acc1"], 0
            else:
                es_stale += 1
            if (epoch + 1) >= cfg.early_stop_min_epochs and \
                    es_stale >= cfg.early_stop_patience:
                msg = (f"[early-stop] no gain > {cfg.early_stop_min_delta} pts "
                       f"for {es_stale} epochs (best {es_best:.2f}%); "
                       f"stopping at epoch {epoch} of {cfg.epochs}")
                print(msg)
                log_file.write_line(msg)
                break

    total_time = time.time() - start_time
    total_time_str = str(datetime.timedelta(seconds=int(total_time)))
    print(f"Training time {total_time_str}")
    log_file.write_final(max_accuracy, test_stats, total_time_str)
    return {"max_accuracy": max_accuracy, **test_stats}


def cli():
    import argparse
    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    args = parser.parse_args()
    cfg = config_from_args(args)
    if cfg.output_dir:
        Path(cfg.output_dir).mkdir(parents=True, exist_ok=True)
    main(cfg)


if __name__ == "__main__":
    cli()
