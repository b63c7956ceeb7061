"""nnUNetTrainer: the training loop.

Capability parity with ref: dinounet/training/nnUNetTrainer/nnUNetTrainer.py
(1318 LoC god-object), re-designed for TPU:
  * hyperparameters, folder layout results/<ds>/<Trainer>__<plans>__<config>/
    fold_N, 5-fold split seeded 12345, 250 train / 50 val iterations per epoch,
    SGD-nesterov(0.99) + weight decay 3e-5 + PolyLR + grad-clip 12, DC+CE loss,
    foreground oversampling 0.33, EMA(0.9) pseudo-Dice model selection,
    checkpoint_{latest,best,final} — all as in the reference
    (ref :146-153,355-389,485-490,530-585,899-1052,1057-1106,1295-1318).
  * TPU-native replacements: DDP/NCCL -> a jax.sharding.Mesh with the batch
    sharded over the 'data' axis under jit (gradient psum and SyncBN come from
    GSPMD, ref :216-218,934-937 obsolete); the batchgenerators CPU augmentation
    worker pool -> jit-compiled on-device augmentation fused into train_step;
    autocast+GradScaler -> bf16 compute with fp32 params/optimizer (no loss
    scaling needed for bf16).
"""

import inspect
import math
import os
import time
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dinounet_tpu import paths
from dinounet_tpu.configuration import ANISO_THRESHOLD, default_num_processes
from dinounet_tpu.models.plain_unet import PlainConvUNet, PlainUNetConfig
from dinounet_tpu.training.augmentation import (
    AugmentConfig,
    augment_batch_2d,
    get_enlarged_patch_size,
)
from dinounet_tpu.training.checkpointing import load_checkpoint, save_checkpoint
from dinounet_tpu.training.dataloading import (
    nnUNetDataLoader2D,
    nnUNetDataLoader3D,
    nnUNetDataset,
    unpack_dataset,
)
from dinounet_tpu.training.logger import nnUNetLogger
from dinounet_tpu.training.losses import dc_and_ce_loss, dc_and_bce_loss, get_tp_fp_fn_tn
from dinounet_tpu.training.lr_scheduler import poly_lr
from dinounet_tpu.utilities import registry
from dinounet_tpu.utilities.json_export import load_json, save_json
from dinounet_tpu.utilities.label_handling import determine_num_input_channels
from dinounet_tpu.utilities.misc import generate_crossval_split
from dinounet_tpu.utilities.plans_handler import PlansManager


@registry.trainers.register("nnUNetTrainer")
class nnUNetTrainer:
    def __init__(self, plans: dict, configuration: str, fold: int, dataset_json: dict,
                 unpack_dataset: bool = True, device=None):
        self.is_ddp = False  # GSPMD replaces process-group DDP
        self.device = device

        # substitute for the reference's init_args capture (ref :106-123)
        self.my_init_kwargs = {
            "plans": plans, "configuration": configuration, "fold": fold,
            "dataset_json": dataset_json, "unpack_dataset": unpack_dataset,
        }

        self.plans_manager = PlansManager(plans)
        self.configuration_manager = self.plans_manager.get_configuration(configuration)
        self.configuration_name = configuration
        self.dataset_json = dataset_json
        self.fold = fold
        self.unpack_dataset = unpack_dataset

        self.preprocessed_dataset_folder_base = os.path.join(
            paths.nnUNet_preprocessed(), self.plans_manager.dataset_name
        )
        self.output_folder_base = os.path.join(
            paths.nnUNet_results(), self.plans_manager.dataset_name,
            self.__class__.__name__ + "__" + self.plans_manager.plans_name + "__"
            + configuration,
        )
        self.output_folder = os.path.join(self.output_folder_base, f"fold_{fold}")
        self.preprocessed_dataset_folder = os.path.join(
            self.preprocessed_dataset_folder_base,
            self.configuration_manager.data_identifier,
        )

        # hyperparameters (ref :146-153)
        self.initial_lr = 1e-2
        self.weight_decay = 3e-5
        self.oversample_foreground_percent = 0.33
        self.num_iterations_per_epoch = 250
        self.num_val_iterations_per_epoch = 50
        self.num_epochs = 1000
        self.current_epoch = 0
        self.enable_deep_supervision = True

        self.label_manager = self.plans_manager.get_label_manager(dataset_json)

        self.num_input_channels = None
        self.network = None  # flax module
        self.variables = None  # {'params': ..., 'batch_stats': ...}
        self.opt_state = None
        self.tx = None
        self._train_step = None
        self._val_step = None
        self._rng = jax.random.key(np.random.SeedSequence().entropy % (2 ** 63))

        self.dataloader_train = None
        self.dataloader_val = None
        self.logger = nnUNetLogger()
        self._best_ema = None
        self.inference_allowed_mirroring_axes = None

        self._ema_loss = None
        self.grad_scale = None
        self.was_initialized = False

        self.mesh = self._make_mesh()

        os.makedirs(self.output_folder, exist_ok=True)
        self.log_file = os.path.join(self.output_folder, f"training_log_{int(time.time())}.txt")

    # ------------------------------------------------------------------ setup

    @property
    def is_cascaded(self) -> bool:
        """ref nnUNetTrainer.py: cascade iff the config names a previous stage."""
        return self.configuration_manager.previous_stage_name is not None

    @property
    def folder_with_segs_from_previous_stage(self):
        """results/<ds>/<Trainer>__<plans>__<prev>/predicted_next_stage/<config>
        (ref nnUNetTrainer.py:131-137)."""
        if not self.is_cascaded:
            return None
        return os.path.join(
            paths.nnUNet_results(), self.plans_manager.dataset_name,
            self.__class__.__name__ + "__" + self.plans_manager.plans_name + "__"
            + self.configuration_manager.previous_stage_name,
            "predicted_next_stage", self.configuration_name)

    @staticmethod
    def _make_mesh() -> Mesh:
        """('data', 'model') mesh over all local devices.

        DINOUNET_TPU_MODEL_AXIS > 1 turns on megatron-style GSPMD sharding of
        the frozen ViT backbone over the inner 'model' axis (the dinounet_7b
        configuration, BASELINE.json config 4); the default 1 is pure data
        parallelism, the reference's DDP (ref run_training.py:104-138) without
        process groups.
        """
        from dinounet_tpu.parallel import make_mesh

        n_model = int(os.environ.get("DINOUNET_TPU_MODEL_AXIS", "1"))
        platform = os.environ.get("DINOUNET_TPU_PLATFORM")  # e.g. "cpu" for tests
        if platform is None:
            # honor an explicitly-pinned default device (tests pin CPU);
            # may be a Device object or a platform string
            dd = jax.config.jax_default_device
            platform = dd if isinstance(dd, str) else getattr(dd, "platform", None)
        devices = jax.devices(platform) if platform else None
        return make_mesh(n_model=n_model, devices=devices)

    def print_to_log_file(self, *args, also_print_to_console: bool = True):
        msg = " ".join(str(a) for a in args)
        timestamp = time.strftime("%Y-%m-%d %H:%M:%S")
        with open(self.log_file, "a") as f:
            f.write(f"{timestamp}: {msg}\n")
        if also_print_to_console:
            print(msg, flush=True)

    @staticmethod
    def build_network_architecture(architecture_class_name: str, arch_init_kwargs: dict,
                                   arch_init_kwargs_req_import, num_input_channels: int,
                                   num_output_channels: int,
                                   enable_deep_supervision: bool = True):
        """Default path: build the conv U-Net named by the plans
        (ref get_network_from_plans.py:9; dotted torch class paths map onto our
        flax equivalents by trailing class name). Returns a flax module."""
        arch = dict(arch_init_kwargs)
        arch["deep_supervision"] = enable_deep_supervision
        class_name = (architecture_class_name or "PlainConvUNet").rsplit(".", 1)[-1]
        if class_name == "ResidualEncoderUNet":
            from dinounet_tpu.models.residual_unet import (
                ResidualEncoderUNet,
                ResidualUNetConfig,
            )

            return ResidualEncoderUNet(
                ResidualUNetConfig.from_plans_arch(arch, num_output_channels))
        cfg = PlainUNetConfig.from_plans_arch(arch, num_output_channels)
        return PlainConvUNet(cfg)

    def initialize(self):
        if self.was_initialized:
            raise RuntimeError("initialize called twice")
        self.num_input_channels = determine_num_input_channels(
            self.plans_manager, self.configuration_manager, self.dataset_json
        )
        self.network = self.build_network_architecture(
            self.configuration_manager.network_arch_class_name,
            self.configuration_manager.network_arch_init_kwargs,
            self.configuration_manager.network_arch_init_kwargs_req_import,
            self.num_input_channels,
            self.label_manager.num_segmentation_heads,
            self.enable_deep_supervision,
        )
        self._init_params_and_optimizer()
        self.was_initialized = True

    def _example_input(self, batch: int = 1) -> jnp.ndarray:
        patch = tuple(self.configuration_manager.patch_size)
        return jnp.zeros((batch, *patch, self.num_input_channels), jnp.float32)

    def _trainable_label_tree(self, params):
        from dinounet_tpu.models.dinounet import backbone_param_filter

        def label(path):
            keys = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
            return "frozen" if backbone_param_filter(keys) else "trainable"

        return jax.tree_util.tree_map_with_path(lambda p, _: label(p), params)

    def configure_optimizers(self):
        """SGD nesterov momentum 0.99, wd 3e-5, grad clip 12, PolyLR(0.9)
        (ref :485-490, :919-924)."""
        lr_schedule = lambda step: poly_lr(
            self.initial_lr, step // self.num_iterations_per_epoch, self.num_epochs
        )
        sgd = optax.chain(
            optax.clip_by_global_norm(12.0),
            optax.add_decayed_weights(self.weight_decay),
            optax.trace(decay=0.99, nesterov=True),
            optax.scale_by_learning_rate(lr_schedule),
        )
        labels = self._trainable_label_tree(self.variables["params"])
        return optax.multi_transform(
            {"trainable": sgd, "frozen": optax.set_to_zero()}, labels
        )

    def _init_params_and_optimizer(self):
        from dinounet_tpu.parallel import param_shardings, replicated

        rng, self._rng = jax.random.split(self._rng)
        x = self._example_input()
        with self.mesh:
            variables = jax.jit(
                lambda k: self.network.init({"params": k}, x, train=False)
            )(rng)
        self.variables = dict(variables)
        if "batch_stats" not in self.variables:
            self.variables["batch_stats"] = {}
        # commit GSPMD shardings: backbone weights split over 'model' (no-op
        # at model axis 1), everything else replicated
        self.variables["params"] = jax.device_put(
            self.variables["params"], param_shardings(self.mesh, self.variables["params"]))
        self.variables["batch_stats"] = jax.device_put(
            self.variables["batch_stats"],
            jax.tree_util.tree_map(lambda _: replicated(self.mesh),
                                   self.variables["batch_stats"]))
        self.tx = self.configure_optimizers()
        self.opt_state = jax.jit(self.tx.init)(self.variables["params"])
        n_params = sum(p.size for p in jax.tree.leaves(self.variables["params"]))
        self.print_to_log_file(f"Network initialized: {n_params / 1e6:.2f}M parameters")

    # -------------------------------------------------------------- splitting

    def do_split(self) -> Tuple[List[str], List[str]]:
        """5-fold CV split seeded 12345, persisted to splits_final.json
        (ref :530-585)."""
        dataset = nnUNetDataset(self.preprocessed_dataset_folder)
        splits_file = os.path.join(self.preprocessed_dataset_folder_base, "splits_final.json")
        if self.fold == "all":
            keys = sorted(dataset.keys())
            return keys, keys
        if not os.path.isfile(splits_file):
            splits = generate_crossval_split(sorted(dataset.keys()), seed=12345, n_splits=5)
            save_json(splits, splits_file)
        else:
            splits = load_json(splits_file)
        if self.fold < len(splits):
            tr_keys = splits[self.fold]["train"]
            val_keys = splits[self.fold]["val"]
        else:
            # fold outside the split file: random 80/20 (ref :570-580)
            rnd = np.random.RandomState(seed=12345 + self.fold)
            keys = np.sort(list(dataset.keys()))
            idx_tr = rnd.choice(len(keys), int(len(keys) * 0.8), replace=False)
            idx_val = [i for i in range(len(keys)) if i not in idx_tr]
            tr_keys = [keys[i] for i in idx_tr]
            val_keys = [keys[i] for i in idx_val]
        return tr_keys, val_keys

    # ------------------------------------------------------------ dataloaders

    def _configure_rotation_dummyDA_mirroring_and_initial_patch_size(self):
        """ref :391-446."""
        patch_size = self.configuration_manager.patch_size
        dim = len(patch_size)
        if dim == 2:
            do_dummy_2d = False
            if max(patch_size) / min(patch_size) > 1.5:
                rotation = (-15.0 / 360 * 2 * np.pi, 15.0 / 360 * 2 * np.pi)
            else:
                rotation = (-np.pi, np.pi)
            mirror_axes = (0, 1)
            initial_patch_size = get_enlarged_patch_size(
                patch_size, max(abs(rotation[0]), abs(rotation[1])), (0.85, 1.25)
            )
        else:
            do_dummy_2d = (max(patch_size) / patch_size[0]) > ANISO_THRESHOLD
            if do_dummy_2d:
                # anisotropic volume: full in-plane rotation only (ref :404-414)
                rotation = (-np.pi, np.pi)
                rotation_per_axis = ((-np.pi, np.pi), (0.0, 0.0), (0.0, 0.0))
            else:
                r = 30.0 / 360 * 2 * np.pi
                rotation = (-r, r)
                rotation_per_axis = ((-r, r),) * 3
            mirror_axes = (0, 1, 2)
            from dinounet_tpu.training.augmentation import get_enlarged_patch_size_3d

            initial_patch_size = get_enlarged_patch_size_3d(
                patch_size, [max(abs(a), abs(b)) for a, b in rotation_per_axis],
                (0.85, 1.25))
            if do_dummy_2d:
                # the through-plane axis is never resampled by in-plane rotation
                initial_patch_size[0] = patch_size[0]
            self._rotation_per_axis = rotation_per_axis
        self.inference_allowed_mirroring_axes = mirror_axes
        return rotation, do_dummy_2d, initial_patch_size, mirror_axes

    def get_dataloaders(self):
        dim = len(self.configuration_manager.patch_size)
        rotation, do_dummy_2d, initial_patch_size, mirror_axes = \
            self._configure_rotation_dummyDA_mirroring_and_initial_patch_size()

        tr_keys, val_keys = self.do_split()
        prev_folder = self.folder_with_segs_from_previous_stage
        dataset_tr = nnUNetDataset(self.preprocessed_dataset_folder, tr_keys,
                                   folder_with_segs_from_previous_stage=prev_folder)
        dataset_val = nnUNetDataset(self.preprocessed_dataset_folder, val_keys,
                                    folder_with_segs_from_previous_stage=prev_folder)

        # the plans batch size is the global batch; round it up to a multiple
        # of the data axis so every device gets >= 1 sample (the reference's
        # DDP per-rank batch split, ref nnUNetTrainer.py:308-353)
        n_data = self.mesh.shape["data"]
        batch_size = -(-self.configuration_manager.batch_size // n_data) * n_data

        loader_cls = nnUNetDataLoader2D if dim == 2 else nnUNetDataLoader3D
        self.dataloader_train = loader_cls(
            dataset_tr, batch_size,
            initial_patch_size, self.configuration_manager.patch_size,
            self.label_manager, self.oversample_foreground_percent,
        )
        self.dataloader_val = loader_cls(
            dataset_val, batch_size,
            self.configuration_manager.patch_size, self.configuration_manager.patch_size,
            self.label_manager, self.oversample_foreground_percent,
        )

        if dim == 2:
            self.augment_cfg = AugmentConfig(
                patch_size=tuple(self.configuration_manager.patch_size)[-2:],
                rotation_range=rotation,
                mirror_axes=mirror_axes,
                use_mask_for_norm=tuple(self.configuration_manager.use_mask_for_norm),
            )
        else:
            from dinounet_tpu.training.augmentation import AugmentConfig3D

            self.augment_cfg = AugmentConfig3D(
                patch_size=tuple(self.configuration_manager.patch_size),
                rotation_ranges=tuple(self._rotation_per_axis),
                mirror_axes=mirror_axes,
                use_mask_for_norm=tuple(self.configuration_manager.use_mask_for_norm),
                scale_in_plane_only=do_dummy_2d,
            )

    # ------------------------------------------------------------- loss/steps

    def _seg_to_region_onehot(self, seg):
        """Labelmap -> per-region binary channels (+ trailing ignore channel),
        the reference's ConvertSegmentationToRegionsTransform
        (ref region_based_training.py:7, wired at nnUNetTrainer.py:788-796)."""
        lm = self.label_manager
        channels = []
        for region in lm.all_regions:
            labels = region if isinstance(region, (list, tuple)) else (region,)
            mask = jnp.zeros(seg.shape, jnp.bool_)
            for l in labels:
                mask = mask | (seg == l)
            channels.append(mask)
        if lm.has_ignore_label:
            channels.append(seg == lm.ignore_label)
        return jnp.stack(channels, axis=-1).astype(jnp.float32)

    def _loss_fn(self, logits, target):
        if self.label_manager.has_regions:
            return dc_and_bce_loss(
                logits, self._seg_to_region_onehot(target),
                batch_dice=self.configuration_manager.batch_dice,
                use_ignore_label=self.label_manager.has_ignore_label,
            )
        return dc_and_ce_loss(
            logits, target, batch_dice=self.configuration_manager.batch_dice,
            smooth=1e-5, do_bg=False, ignore_label=self.label_manager.ignore_label,
        )

    def _build_steps(self):
        model = self.network
        tx = self.tx
        augment_cfg = self.augment_cfg
        dim = len(self.configuration_manager.patch_size)
        loss_fn_outer = self._loss_fn
        num_classes = self.label_manager.num_segmentation_heads
        has_ignore = self.label_manager.has_ignore_label
        has_regions = self.label_manager.has_regions
        ignore_label = self.label_manager.ignore_label

        is_cascaded = self.is_cascaded
        fg_labels = tuple(self.label_manager.foreground_labels)

        def train_step(params, batch_stats, opt_state, data, seg, rng):
            seg = seg.astype(jnp.int32)  # narrow wire dtype (see _batch_to_device)
            aug_rng, casc_rng, drop_rng = jax.random.split(rng, 3)
            if dim == 2:
                data_a, seg_a = augment_batch_2d(aug_rng, data, seg, augment_cfg)
            else:
                from dinounet_tpu.training.augmentation import augment_batch_3d

                data_a, seg_a = augment_batch_3d(aug_rng, data, seg, augment_cfg)
            if is_cascaded:
                from dinounet_tpu.training.augmentation import (
                    cascade_onehot_augment,
                )

                prev = seg_a[..., 1]
                seg_a = seg_a[..., 0]
                casc_keys = jax.random.split(casc_rng, prev.shape[0])
                onehot = jax.vmap(
                    lambda k, p: cascade_onehot_augment(k, p, fg_labels)
                )(casc_keys, prev)
                data_a = jnp.concatenate([data_a, onehot.astype(data_a.dtype)], -1)

            def loss_of(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats}, data_a, train=True,
                    rngs={"dropout": drop_rng}, mutable=["batch_stats"],
                )
                if isinstance(out, (list, tuple)):
                    from dinounet_tpu.training.losses import (
                        deep_supervision_loss,
                        deep_supervision_weights,
                    )
                    from dinounet_tpu.training.augmentation import downsample_seg_for_ds

                    weights = deep_supervision_weights(len(out))
                    scales = [
                        tuple(o.shape[1 + i] / out[0].shape[1 + i] for i in range(dim))
                        for o in out
                    ]
                    targets = downsample_seg_for_ds(seg_a, scales)
                    loss = deep_supervision_loss(loss_fn_outer, out, targets, weights)
                else:
                    loss = loss_fn_outer(out, seg_a)
                return loss, mut["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_bs, new_opt, loss

        def val_step(params, batch_stats, data, seg):
            seg = seg.astype(jnp.int32)  # narrow wire dtype (see _batch_to_device)
            if is_cascaded:
                prev = jnp.where(seg[..., 1] < 0, 0, seg[..., 1])
                seg = seg[..., 0]
                onehot = jnp.stack(
                    [(prev == l).astype(data.dtype) for l in fg_labels], -1)
                data = jnp.concatenate([data, onehot], -1)
            seg = jnp.where(seg < 0, 0, seg)
            out = model.apply({"params": params, "batch_stats": batch_stats}, data,
                              train=False)
            if isinstance(out, (list, tuple)):
                out = out[0]
            loss = loss_fn_outer(out, seg)
            # hard pseudo-Dice counts (ref :946-1008)
            axes = (0,) + tuple(range(1, out.ndim - 1))
            if has_regions:
                # region branch: sigmoid > 0.5 per region channel (ref :963-979)
                target = self._seg_to_region_onehot(seg)
                if has_ignore:
                    mask = 1.0 - target[..., -1:]
                    target = target[..., :-1]
                else:
                    mask = 1.0
                pred = (jax.nn.sigmoid(out.astype(jnp.float32)) > 0.5).astype(
                    jnp.float32)
                tp = (pred * target * mask).sum(axes)
                fp = (pred * (1 - target) * mask).sum(axes)
                fn = ((1 - pred) * target * mask).sum(axes)
                return loss, tp, fp, fn
            if has_ignore:
                mask = (seg != ignore_label)[..., None].astype(jnp.float32)
                seg_eval = jnp.where(seg == ignore_label, 0, seg)
            else:
                mask = None
                seg_eval = seg
            pred_onehot = jax.nn.one_hot(out.argmax(-1), num_classes)
            tp = (pred_onehot * jax.nn.one_hot(seg_eval, num_classes)
                  * (mask if mask is not None else 1.0)).sum(axes)
            fp = (pred_onehot * (1 - jax.nn.one_hot(seg_eval, num_classes))
                  * (mask if mask is not None else 1.0)).sum(axes)
            fn = ((1 - pred_onehot) * jax.nn.one_hot(seg_eval, num_classes)
                  * (mask if mask is not None else 1.0)).sum(axes)
            return loss, tp, fp, fn

        data_sh = NamedSharding(self.mesh, P("data"))
        repl = NamedSharding(self.mesh, P())
        # params/batch_stats/opt_state keep their committed (GSPMD) shardings:
        # replicated at model axis 1, megatron-split for the 7B backbone.
        self._train_step = jax.jit(
            train_step,
            in_shardings=(None, None, None, data_sh, data_sh, repl),
            donate_argnums=(0, 1, 2),
        )
        self._val_step = jax.jit(
            val_step, in_shardings=(None, None, data_sh, data_sh),
            out_shardings=repl,
        )

    # ------------------------------------------------------------ train loop

    def on_train_start(self):
        if not self.was_initialized:
            self.initialize()
        if self.unpack_dataset:
            self.print_to_log_file("unpacking dataset...")
            unpack_dataset(self.preprocessed_dataset_folder,
                           num_processes=default_num_processes)
        self.get_dataloaders()
        self._build_steps()
        # save debug information + copies of plans/dataset json (ref :834-853)
        save_json(self.plans_manager.plans,
                  os.path.join(self.output_folder_base, "plans.json"), sort_keys=False)
        save_json(self.dataset_json, os.path.join(self.output_folder_base, "dataset.json"))
        self._save_debug_information()

    def _save_debug_information(self):
        dct = {
            k: str(v) for k, v in self.__dict__.items()
            if not k.startswith("_") and isinstance(v, (str, int, float, bool))
        }
        # honor an explicitly-pinned default device (tests pin CPU) so the
        # debug dump never initializes an unused backend; may be a Device
        # object or a platform string
        dd = jax.config.jax_default_device
        platform = dd if isinstance(dd, str) else getattr(dd, "platform", None)
        dct["device_count"] = (len(jax.devices(platform)) if platform
                               else jax.device_count())
        dct["backend"] = platform or jax.default_backend()
        save_json(dct, os.path.join(self.output_folder, "debug.json"))

    def _batch_to_device(self, batch) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # loader: (B, C, *spatial) -> NHWC; seg (B, 1, *spatial) -> (B, *spatial)
        # (cascade: seg keeps its channels last, (B, *spatial, 2)).
        # The seg goes over the host->device link in the narrowest lossless
        # integer dtype (labels are small; -1 may be present pre-augmentation)
        # and is upcast to int32 inside the jitted step — on remote-attached
        # accelerators the batch upload is a measurable slice of the
        # iteration time.
        data = np.moveaxis(batch["data"], 1, -1)
        if self.is_cascaded:
            seg = np.moveaxis(batch["seg"], 1, -1)
        else:
            seg = batch["seg"][:, 0]
        # fixed per-trainer wire dtype (per-batch min/max would retrace the step)
        labels = [l for l in self.label_manager.all_labels]
        if self.label_manager.has_ignore_label:
            labels.append(self.label_manager.ignore_label)
        wire = np.int8 if max(labels) <= 127 else np.int16
        return jnp.asarray(data), jnp.asarray(seg.astype(wire))

    def train_step_host(self, batch) -> float:
        rng, self._rng = jax.random.split(self._rng)
        data, seg = self._batch_to_device(batch)
        first = not getattr(self, "_train_step_ran", False)
        if first:
            t0 = time.time()
        params, bs, opt, loss = self._train_step(
            self.variables["params"], self.variables["batch_stats"], self.opt_state,
            data, seg, rng,
        )
        if first:
            # cold-compile visibility (the first step compiles the whole
            # differentiated graph incl. the Pallas kernels; later processes
            # load it from the persistent executable cache)
            jax.device_get(loss)
            self._train_step_ran = True
            self.print_to_log_file(
                f"first train step (compile or cache load + step): "
                f"{time.time() - t0:.1f}s")
        self.variables = {"params": params, "batch_stats": bs}
        self.opt_state = opt
        return loss

    def validation_step_host(self, batch):
        data, seg = self._batch_to_device(batch)
        return self._val_step(
            self.variables["params"], self.variables["batch_stats"], data, seg
        )

    def current_lr(self) -> float:
        return poly_lr(self.initial_lr, self.current_epoch, self.num_epochs)

    class _BatchPrefetcher:
        """Background host thread generating batches a bounded distance ahead.

        The reference keeps the GPU fed with batchgenerators worker processes
        (nnUNetTrainer.py:643-649); here augmentation is on-device, so the
        host work per iteration is just memmap patch extraction — one thread
        with a depth-2 queue overlaps it with the device step.
        """

        def __init__(self, loader, depth: int = 2):
            import queue
            import threading

            self._loader = loader
            self._q = queue.Queue(maxsize=depth)
            self._stop = threading.Event()
            self._exc = None
            self._t = threading.Thread(target=self._work, daemon=True)
            self._t.start()

        def _work(self):
            import queue

            try:
                while not self._stop.is_set():
                    batch = self._loader.generate_train_batch()
                    while not self._stop.is_set():
                        try:
                            self._q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # surfaced on the consumer side
                self._exc = e

        def next(self):
            import queue

            while True:
                if self._exc is not None:
                    raise self._exc
                try:
                    return self._q.get(timeout=1.0)
                except queue.Empty:
                    if not self._t.is_alive() and self._exc is None:
                        raise RuntimeError("batch prefetcher thread died")

        def close(self):
            self._stop.set()

    def run_training(self):
        self.on_train_start()
        first_epoch = self.current_epoch
        prefetch = self._BatchPrefetcher(self.dataloader_train)
        try:
            self._run_training_epochs(first_epoch, prefetch)
        finally:
            prefetch.close()
        self.on_train_end()

    def _run_training_epochs(self, first_epoch, prefetch):
        for epoch in range(self.current_epoch, self.num_epochs):
            self.logger.log("epoch_start_timestamps", time.time(), epoch)
            self.print_to_log_file(f"\nEpoch {epoch}")
            self.print_to_log_file(f"Current learning rate: {round(self.current_lr(), 5)}")

            # optional profiler capture of a slice of epoch 0 (the reference
            # has no profiler on this path, SURVEY.md §5; this is the
            # TPU-native equivalent: a jax.profiler trace viewable in
            # TensorBoard/Perfetto). Enable with DINOUNET_TPU_PROFILE_DIR.
            profile_dir = os.environ.get("DINOUNET_TPU_PROFILE_DIR")
            do_profile = profile_dir and epoch == first_epoch

            train_losses = []
            for it in range(self.num_iterations_per_epoch):
                if do_profile and it == min(10, self.num_iterations_per_epoch - 1):
                    jax.profiler.start_trace(profile_dir)
                batch = prefetch.next()
                train_losses.append(self.train_step_host(batch))
                if do_profile and it == min(14, self.num_iterations_per_epoch - 1):
                    jax.device_get(train_losses[-1])  # drain before stopping
                    jax.profiler.stop_trace()
                    do_profile = False
                    self.print_to_log_file(f"profiler trace written to {profile_dir}")
            train_loss = float(np.mean([jax.device_get(l) for l in train_losses]))
            self.logger.log("train_losses", train_loss, epoch)

            val_losses, tps, fps, fns = [], [], [], []
            for _ in range(self.num_val_iterations_per_epoch):
                batch = self.dataloader_val.generate_train_batch()
                loss, tp, fp, fn = self.validation_step_host(batch)
                val_losses.append(loss)
                tps.append(tp)
                fps.append(fp)
                fns.append(fn)
            val_loss = float(np.mean([jax.device_get(l) for l in val_losses]))
            tp = np.sum(jax.device_get(tps), 0)
            fp = np.sum(jax.device_get(fps), 0)
            fn = np.sum(jax.device_get(fns), 0)
            self.on_validation_epoch_end(val_loss, tp, fp, fn, epoch)

            self.logger.log("epoch_end_timestamps", time.time(), epoch)
            self.logger.log("lrs", self.current_lr(), epoch)
            self.on_epoch_end(epoch)
            self.current_epoch = epoch + 1

    def on_validation_epoch_end(self, val_loss, tp, fp, fn, epoch):
        """Global per-class Dice from summed counts (ref :1010-1052)."""
        self.logger.log("val_losses", val_loss, epoch)
        global_dc_per_class = [
            2 * i / (2 * i + j + k) if (2 * i + j + k) > 0 else np.nan
            for i, j, k in zip(tp[1:], fp[1:], fn[1:])
        ] if not self.label_manager.has_regions else [
            2 * i / (2 * i + j + k) if (2 * i + j + k) > 0 else np.nan
            for i, j, k in zip(tp, fp, fn)
        ]
        mean_fg_dice = float(np.nanmean(global_dc_per_class))
        self.logger.log("mean_fg_dice", mean_fg_dice, epoch)
        self.logger.log("dice_per_class_or_region",
                        [float(x) for x in global_dc_per_class], epoch)
        self.print_to_log_file(f"train_loss {round(self.logger.my_fantastic_logging['train_losses'][epoch], 4)}")
        self.print_to_log_file(f"val_loss {round(val_loss, 4)}")
        self.print_to_log_file(
            f"Pseudo dice {[round(float(x), 4) for x in global_dc_per_class]}"
        )

    def on_epoch_end(self, epoch):
        """Checkpoint every 50 epochs + best-EMA (ref :1057-1081)."""
        if (epoch + 1) % 50 == 0 or epoch == self.num_epochs - 1:
            self.save_checkpoint(os.path.join(self.output_folder, "checkpoint_latest.pth"))
        ema = self.logger.my_fantastic_logging["ema_fg_dice"][epoch]
        if self._best_ema is None or ema > self._best_ema:
            self._best_ema = ema
            self.print_to_log_file(
                f"Yayy! New best EMA pseudo Dice: {round(float(ema), 4)}"
            )
            self.save_checkpoint(os.path.join(self.output_folder, "checkpoint_best.pth"))
        self.logger.plot_progress_png(self.output_folder)

    def on_train_end(self):
        self.current_epoch -= 1
        self.save_checkpoint(os.path.join(self.output_folder, "checkpoint_final.pth"))
        self.current_epoch += 1
        latest = os.path.join(self.output_folder, "checkpoint_latest.pth")
        if os.path.isfile(latest):
            os.remove(latest)
        elif os.path.isdir(latest):  # sharded checkpoint directory
            import shutil

            shutil.rmtree(latest)
        self.print_to_log_file("Training done.")

    # ------------------------------------------------------------ checkpoints

    def save_checkpoint(self, filename: str):
        """ref :1083-1106 (same key set)."""
        init_args = dict(self.my_init_kwargs)
        checkpoint = {
            "network_weights": self.variables,
            "optimizer_state": self.opt_state,
            "grad_scaler_state": None,
            "logging": self.logger.get_checkpoint(),
            "_best_ema": self._best_ema,
            "current_epoch": self.current_epoch + 1,
            "init_args": {"configuration": self.configuration_name,
                          "fold": self.fold},
            "trainer_name": self.__class__.__name__,
            "inference_allowed_mirroring_axes": self.inference_allowed_mirroring_axes,
        }
        # model-sharded runs (7B over a model axis) write per-shard orbax
        # directories instead of gathering everything to one host
        save_checkpoint(checkpoint, filename,
                        sharded=self.mesh.shape["model"] > 1)

    def load_checkpoint(self, filename_or_checkpoint: Union[str, dict]):
        """ref :1108-1144."""
        if not self.was_initialized:
            self.initialize()
        if (isinstance(filename_or_checkpoint, str)
                and os.path.isdir(filename_or_checkpoint)):
            # sharded orbax checkpoint (written by model-axis runs): restore
            # each array straight onto its mesh placement via an abstract
            # template built from the live (already-sharded) state — the
            # host-numpy path would gather a 7B state to one host and then
            # materialize it unsharded on the default device
            checkpoint = self._load_sharded_checkpoint_onto_mesh(
                filename_or_checkpoint)
            self.variables = checkpoint["network_weights"]
            if checkpoint.get("optimizer_state") is not None:
                self.opt_state = checkpoint["optimizer_state"]
        else:
            checkpoint = (
                load_checkpoint(filename_or_checkpoint)
                if isinstance(filename_or_checkpoint, str)
                else filename_or_checkpoint
            )
            self.variables = jax.tree.map(jnp.asarray, checkpoint["network_weights"])
            if checkpoint.get("optimizer_state") is not None:
                from dinounet_tpu.training.checkpointing import (
                    maybe_unflatten_opt_state,
                )

                template = self.tx.init(self.variables["params"])
                opt_state = maybe_unflatten_opt_state(
                    checkpoint["optimizer_state"], template)
                self.opt_state = jax.tree.map(
                    lambda t, s: jnp.asarray(s).astype(t.dtype) if hasattr(t, "dtype") else s,
                    template, opt_state,
                )
        self.logger.load_checkpoint(checkpoint["logging"])
        self._best_ema = checkpoint["_best_ema"]
        self.current_epoch = checkpoint["current_epoch"]
        self.inference_allowed_mirroring_axes = checkpoint.get(
            "inference_allowed_mirroring_axes"
        )

    def _load_sharded_checkpoint_onto_mesh(self, directory: str) -> dict:
        """Restore a sharded orbax checkpoint with every array placed on its
        current-mesh sharding (the live variables/opt-state placements serve
        as the abstract template; orbax reshards on read if the writing run
        used a different topology)."""
        from dinounet_tpu.training.checkpointing import load_checkpoint_sharded

        def abstract(tree):
            return jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                               sharding=a.sharding)
                if hasattr(a, "sharding") else a,
                tree,
            )

        template = {
            "network_weights": abstract(self.variables),
            "optimizer_state": abstract(self.tx.init(self.variables["params"])),
        }
        return load_checkpoint_sharded(directory, template)

    # --------------------------------------------------- final validation

    def set_deep_supervision_enabled(self, enabled: bool):
        self.enable_deep_supervision = enabled

    def perform_actual_validation(self, save_probabilities: bool = False):
        """Full sliding-window inference over the validation split + metrics
        (ref :1146-1293)."""
        from dinounet_tpu.evaluation.metrics import compute_metrics_on_folder
        from dinounet_tpu.inference.export import export_prediction_from_logits
        from dinounet_tpu.inference.predictor import nnUNetPredictor

        predictor = nnUNetPredictor(
            tile_step_size=0.5, use_gaussian=True, use_mirroring=True,
            verbose=False, allow_tqdm=False,
        )
        # rebuild the network with deep supervision off for inference
        inference_network = self.build_network_architecture(
            self.configuration_manager.network_arch_class_name,
            self.configuration_manager.network_arch_init_kwargs,
            self.configuration_manager.network_arch_init_kwargs_req_import,
            self.num_input_channels,
            self.label_manager.num_segmentation_heads,
            enable_deep_supervision=False,
        )
        predictor.manual_initialization(
            inference_network, self.plans_manager, self.configuration_manager,
            [self.variables], self.dataset_json, self.__class__.__name__,
            self.inference_allowed_mirroring_axes,
        )

        validation_output_folder = os.path.join(self.output_folder, "validation")
        os.makedirs(validation_output_folder, exist_ok=True)
        _, val_keys = self.do_split()
        dataset_val = nnUNetDataset(
            self.preprocessed_dataset_folder, val_keys,
            folder_with_segs_from_previous_stage=self.folder_with_segs_from_previous_stage,
        )
        # cascade: export validation logits resampled for every next stage
        # (ref :1240-1256)
        next_stages = self.configuration_manager.next_stage_names or []
        for n in next_stages:
            os.makedirs(os.path.join(self.output_folder_base,
                                     "predicted_next_stage", n), exist_ok=True)

        for k in val_keys:
            self.print_to_log_file(f"predicting {k}")
            data, seg, properties = dataset_val.load_case(k)
            data = np.asarray(data)
            if self.is_cascaded:
                # prev-stage labelmap rides as the last seg channel; feed it to
                # the net as one-hot channels (ref :1217-1230)
                from dinounet_tpu.utilities.label_handling import (
                    convert_labelmap_to_one_hot,
                )

                data = np.vstack(
                    (data, convert_labelmap_to_one_hot(
                        np.asarray(seg[-1]), self.label_manager.foreground_labels,
                        data.dtype)))
            output_filename_truncated = os.path.join(validation_output_folder, k)
            prediction = predictor.predict_logits_from_preprocessed_data(data)
            export_prediction_from_logits(
                prediction, properties, self.configuration_manager, self.plans_manager,
                self.dataset_json, output_filename_truncated, save_probabilities,
            )
            for n in next_stages:
                from dinounet_tpu.inference.export import resample_and_save

                next_cfg = self.plans_manager.get_configuration(n)
                next_dataset = nnUNetDataset(
                    os.path.join(self.preprocessed_dataset_folder_base,
                                 next_cfg.data_identifier), [k])
                target_shape = next_dataset.load_case(k)[0].shape[1:]
                resample_and_save(
                    prediction, target_shape,
                    os.path.join(self.output_folder_base, "predicted_next_stage",
                                 n, k + ".npz"),
                    self.plans_manager, self.configuration_manager, properties,
                    self.dataset_json)

        gt_folder = os.path.join(self.preprocessed_dataset_folder_base, "gt_segmentations")
        if os.path.isdir(gt_folder):
            metrics = compute_metrics_on_folder(
                gt_folder, validation_output_folder,
                os.path.join(validation_output_folder, "summary.json"),
                self.plans_manager.image_reader_writer_class(),
                self.dataset_json["file_ending"],
                self.label_manager.foreground_regions if self.label_manager.has_regions
                else self.label_manager.foreground_labels,
                self.label_manager.ignore_label,
            )
            self.print_to_log_file(
                "Mean Validation Dice:", metrics["foreground_mean"]["Dice"]
            )
            return metrics
        return None
