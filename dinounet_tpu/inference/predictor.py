"""nnUNetPredictor: file/array prediction with fold ensembling and mirror TTA.

Capability parity with ref: dinounet/inference/predict_from_raw_data.py:38-776:
  * initialize_from_trained_model_folder: restores the trainer class by name
    (explicit registry instead of module scanning), rebuilds the network with
    deep supervision off, loads fold checkpoints (ref :67-130).
  * manual_initialization for trainer-internal validation (ref :132-155).
  * predict_from_files with num_parts/part_id sharding and overwrite handling
    (ref :167-205,207-346).
  * predict_logits_from_preprocessed_data: averages logits over fold
    checkpoints (ref :466-501).
  * sliding-window core: batched tiles on device (see sliding_window.py).
"""

import os
from typing import List, Optional, Tuple, Union

import jax
import numpy as np

from dinounet_tpu.inference.export import export_prediction_from_logits
from dinounet_tpu.inference.sliding_window import predict_sliding_window_return_logits
from dinounet_tpu.planning.dataset_utils import create_lists_from_splitted_dataset_folder
from dinounet_tpu.utilities import registry
from dinounet_tpu.utilities.json_export import load_json
from dinounet_tpu.utilities.label_handling import determine_num_input_channels
from dinounet_tpu.utilities.plans_handler import PlansManager


class nnUNetPredictor:
    def __init__(self, tile_step_size: float = 0.5, use_gaussian: bool = True,
                 use_mirroring: bool = True, perform_everything_on_device: bool = True,
                 device=None, verbose: bool = False, verbose_preprocessing: bool = False,
                 allow_tqdm: bool = True, tile_batch: int = 8):
        self.tile_step_size = tile_step_size
        self.use_gaussian = use_gaussian
        self.use_mirroring = use_mirroring
        self.verbose = verbose
        self.verbose_preprocessing = verbose_preprocessing
        self.allow_tqdm = allow_tqdm
        self.tile_batch = tile_batch
        self.device = device

        self.plans_manager: Optional[PlansManager] = None
        self.configuration_manager = None
        self.dataset_json: Optional[dict] = None
        self.trainer_name: Optional[str] = None
        self.network = None  # flax module
        self.list_of_parameters: List[dict] = []  # one variables dict per fold
        self.allowed_mirroring_axes: Optional[Tuple[int, ...]] = None
        self.label_manager = None

    # ---------------- initialization ----------------

    def initialize_from_trained_model_folder(self, model_training_output_dir: str,
                                             use_folds: Union[Tuple, List, None],
                                             checkpoint_name: str = "checkpoint_final.pth"):
        """ref predict_from_raw_data.py:67-130."""
        from dinounet_tpu.training.checkpointing import load_checkpoint

        if use_folds is None:
            use_folds = self.auto_detect_available_folds(
                model_training_output_dir, checkpoint_name
            )
        dataset_json = load_json(os.path.join(model_training_output_dir, "dataset.json"))
        plans = load_json(os.path.join(model_training_output_dir, "plans.json"))
        plans_manager = PlansManager(plans)

        if isinstance(use_folds, str):
            use_folds = [use_folds]

        parameters = []
        checkpoint = None
        for i, f in enumerate(use_folds):
            f = int(f) if f != "all" else f
            checkpoint = load_checkpoint(
                os.path.join(model_training_output_dir, f"fold_{f}", checkpoint_name)
            )
            if i == 0:
                trainer_name = checkpoint["trainer_name"]
                configuration_name = checkpoint["init_args"]["configuration"]
                inference_allowed_mirroring_axes = checkpoint.get(
                    "inference_allowed_mirroring_axes"
                )
            parameters.append(checkpoint["network_weights"])

        configuration_manager = plans_manager.get_configuration(configuration_name)
        num_input_channels = determine_num_input_channels(
            plans_manager, configuration_manager, dataset_json
        )
        trainer_class = registry.trainers.get(trainer_name)
        network = trainer_class.build_network_architecture(
            configuration_manager.network_arch_class_name,
            configuration_manager.network_arch_init_kwargs,
            configuration_manager.network_arch_init_kwargs_req_import,
            num_input_channels,
            plans_manager.get_label_manager(dataset_json).num_segmentation_heads,
            enable_deep_supervision=False,
        )

        self.plans_manager = plans_manager
        self.configuration_manager = configuration_manager
        self.list_of_parameters = parameters
        self.network = network
        self.dataset_json = dataset_json
        self.trainer_name = trainer_name
        self.allowed_mirroring_axes = inference_allowed_mirroring_axes
        self.label_manager = plans_manager.get_label_manager(dataset_json)

    def manual_initialization(self, network, plans_manager: PlansManager,
                              configuration_manager, parameters: Optional[List[dict]],
                              dataset_json: dict, trainer_name: str,
                              inference_allowed_mirroring_axes: Optional[Tuple[int, ...]]):
        """ref :132-155 (used by the trainer's internal validation)."""
        self.plans_manager = plans_manager
        self.configuration_manager = configuration_manager
        self.list_of_parameters = parameters
        self.network = network
        self.dataset_json = dataset_json
        self.trainer_name = trainer_name
        self.allowed_mirroring_axes = inference_allowed_mirroring_axes
        self.label_manager = plans_manager.get_label_manager(dataset_json)

    @staticmethod
    def auto_detect_available_folds(model_training_output_dir: str,
                                    checkpoint_name: str) -> List[int]:
        fold_folders = [
            f for f in os.listdir(model_training_output_dir)
            if f.startswith("fold_") and f != "fold_all"
            and os.path.isfile(os.path.join(model_training_output_dir, f, checkpoint_name))
        ]
        assert len(fold_folders), f"No fold checkpoints in {model_training_output_dir}"
        return sorted(int(f.split("_")[-1]) for f in fold_folders)

    # ---------------- file management ----------------

    def _manage_input_and_output_lists(
        self, list_of_lists_or_source_folder, output_folder_or_list_of_truncated_output_files,
        folder_with_segs_from_prev_stage: Optional[str] = None, overwrite: bool = True,
        part_id: int = 0, num_parts: int = 1, save_probabilities: bool = False,
    ):
        """ref :167-205: folder scan, part striding, overwrite skip."""
        if isinstance(list_of_lists_or_source_folder, str):
            list_of_lists_or_source_folder = create_lists_from_splitted_dataset_folder(
                list_of_lists_or_source_folder, self.dataset_json["file_ending"]
            )
        list_of_lists = list_of_lists_or_source_folder[part_id::num_parts]
        caseids = [
            os.path.basename(i[0])[: -(len(self.dataset_json["file_ending"]) + 5)]
            for i in list_of_lists
        ]

        if isinstance(output_folder_or_list_of_truncated_output_files, str):
            output_folder = output_folder_or_list_of_truncated_output_files
            output_filename_truncated = [os.path.join(output_folder, c) for c in caseids]
        elif output_folder_or_list_of_truncated_output_files is None:
            output_filename_truncated = None
        else:
            output_filename_truncated = (
                output_folder_or_list_of_truncated_output_files[part_id::num_parts]
            )

        seg_from_prev_stage_files = [
            os.path.join(folder_with_segs_from_prev_stage, c + self.dataset_json["file_ending"])
            if folder_with_segs_from_prev_stage is not None else None
            for c in caseids
        ]
        if not overwrite and output_filename_truncated is not None:
            tmp = [
                os.path.isfile(i + self.dataset_json["file_ending"])
                for i in output_filename_truncated
            ]
            if save_probabilities:
                tmp2 = [os.path.isfile(i + ".npz") for i in output_filename_truncated]
                tmp = [i and j for i, j in zip(tmp, tmp2)]
            not_existing = [i for i, j in enumerate(tmp) if not j]
            output_filename_truncated = [output_filename_truncated[i] for i in not_existing]
            list_of_lists = [list_of_lists[i] for i in not_existing]
            seg_from_prev_stage_files = [seg_from_prev_stage_files[i] for i in not_existing]
        return list_of_lists, output_filename_truncated, seg_from_prev_stage_files

    # ---------------- prediction ----------------

    def predict_logits_from_preprocessed_data(self, data: np.ndarray) -> np.ndarray:
        """Average logits over fold checkpoints (ref :466-501).

        The volume is uploaded once and the fold average is taken on device —
        one device->host transfer of fp16 logits total, instead of one fp32
        transfer (and one upload) per fold. fp16 output is the reference's
        contract: it accumulates half-precision on device (ref :583-592) and
        averages the half logits on CPU (ref :491-498).
        """
        from dinounet_tpu.inference.sliding_window import (
            _accum_budget_bytes,
            _predict_host_accumulate,
            finalize_sliding_window_logits,
            make_tile_batch_forward,
            prepare_sliding_window_volume,
        )

        patch_size = tuple(self.configuration_manager.patch_size)
        predictor = self._get_tile_predictor()
        volume, offsets, revert = prepare_sliding_window_volume(
            np.asarray(data), patch_size, self.tile_step_size)
        num_classes = self.label_manager.num_segmentation_heads
        accum_bytes = int(np.prod(volume.shape[:3])) * (num_classes + 1) * 4
        if accum_bytes > _accum_budget_bytes():
            # memory escape hatch (ref predict_from_raw_data.py:709-718):
            # device predicts tile batches, host accumulates per fold
            if self.verbose:
                print(f"accumulator {accum_bytes/2**30:.1f} GiB over budget; "
                      "host-side accumulation")
            mirror_axes = (self.allowed_mirroring_axes if self.use_mirroring
                           else None)
            fwd = make_tile_batch_forward(
                predictor.apply_fn, patch_size, mirror_axes=mirror_axes,
                use_gaussian=self.use_gaussian)
            # one accumulator pair across folds: logits add in place, the
            # (fold-invariant) gaussian weights scatter only once
            accum_sum = weights = None
            for params in self.list_of_parameters:
                accum_sum, weights = _predict_host_accumulate(
                    fwd, volume, None, np.asarray(offsets), patch_size,
                    num_classes, params, predictor.tile_batch,
                    self.use_gaussian, accum=accum_sum, weights=weights)
            n = len(self.list_of_parameters)
            return finalize_sliding_window_logits(
                accum_sum, weights * n, revert, out_dtype=np.float16)
        accum_sum = None
        for params in self.list_of_parameters:
            accum, weights = predictor(volume, offsets, params)
            accum_sum = accum if accum_sum is None else accum_sum + accum
        n = len(self.list_of_parameters)
        return finalize_sliding_window_logits(
            accum_sum, weights * n, revert, out_dtype=np.float16)

    def _get_tile_predictor(self):
        """One compiled tile predictor per configuration, reused across all
        cases and fold checkpoints (variables flow through as a jit argument,
        so fold switches don't retrace the big model graph)."""
        from dinounet_tpu.inference.sliding_window import make_tile_predictor

        mirror_axes = self.allowed_mirroring_axes if self.use_mirroring else None
        patch_size = tuple(self.configuration_manager.patch_size)
        mesh = self._inference_mesh()
        # 3-D tiles are ~patch_size[0] times bigger than 2-D ones: shrink the
        # batch BEFORE rounding it up to the mesh's data axis
        tile_batch = self.tile_batch if len(patch_size) == 2 else max(
            1, self.tile_batch // 4)
        if mesh is not None:
            n_data = mesh.shape["data"]
            tile_batch = -(-tile_batch // n_data) * n_data
        key = (patch_size, self.label_manager.num_segmentation_heads,
               tile_batch, mirror_axes, self.use_gaussian, mesh)
        if getattr(self, "_tile_predictor_key", None) != key:
            model = self.network
            self._tile_predictor = make_tile_predictor(
                lambda v, x: model.apply(v, x, train=False),
                patch_size, self.label_manager.num_segmentation_heads,
                tile_batch=tile_batch, mirror_axes=mirror_axes,
                use_gaussian=self.use_gaussian, mesh=mesh)
            self._tile_predictor_key = key
        return self._tile_predictor

    def predict_sliding_window_return_logits(self, data: np.ndarray,
                                             variables: Optional[dict] = None) -> np.ndarray:
        if variables is None:
            variables = self.list_of_parameters[0]
        mirror_axes = self.allowed_mirroring_axes if self.use_mirroring else None
        patch_size = tuple(self.configuration_manager.patch_size)
        return predict_sliding_window_return_logits(
            None, np.asarray(data), patch_size,
            self.label_manager.num_segmentation_heads,
            tile_step_size=self.tile_step_size, mirror_axes=mirror_axes,
            use_gaussian=self.use_gaussian, verbose=self.verbose,
            predictor=self._get_tile_predictor(), variables=variables,
        )

    def predict_sliding_window_return_logits_with_target(
            self, data: np.ndarray, target_mask: np.ndarray,
            variables: Optional[dict] = None) -> np.ndarray:
        """`*_with_target` entry point (ref predict_from_raw_data.py:728-776):
        for networks whose forward takes (image, mask) — the mask volume is
        sliced and mirror-flipped alongside the image. data/target_mask:
        (C, Z, Y, X)."""
        from dinounet_tpu.inference.sliding_window import make_tile_predictor

        if variables is None:
            variables = self.list_of_parameters[0]
        mirror_axes = self.allowed_mirroring_axes if self.use_mirroring else None
        patch_size = tuple(self.configuration_manager.patch_size)
        model = self.network
        predictor = make_tile_predictor(
            lambda v, x, t: model.apply(v, x, t, train=False),
            patch_size, self.label_manager.num_segmentation_heads,
            tile_batch=self.tile_batch if len(patch_size) == 2 else max(
                1, self.tile_batch // 4),
            mirror_axes=mirror_axes, use_gaussian=self.use_gaussian,
            mesh=self._inference_mesh(), with_target=True)
        return predict_sliding_window_return_logits(
            None, np.asarray(data), patch_size,
            self.label_manager.num_segmentation_heads,
            tile_step_size=self.tile_step_size, mirror_axes=mirror_axes,
            use_gaussian=self.use_gaussian, verbose=self.verbose,
            predictor=predictor, variables=variables,
            target_mask=np.asarray(target_mask),
        )

    def _inference_mesh(self):
        """('data','model') mesh over the local devices when more than one is
        attached: tile batches shard over 'data' so the sliding window scales
        to multi-chip serving (the reference has no multi-GPU inference beyond
        part-sharding whole cases, SURVEY.md §2.10)."""
        import jax

        from dinounet_tpu.parallel import make_mesh

        platform = os.environ.get("DINOUNET_TPU_PLATFORM")
        if platform is None:
            # honor an explicitly-pinned default device (tests pin CPU) —
            # never initialize a backend the session isn't using; the config
            # value may be a Device object or a platform string
            dd = jax.config.jax_default_device
            platform = dd if isinstance(dd, str) else getattr(dd, "platform", None)
        devices = jax.devices(platform) if platform else jax.devices()
        if len(devices) <= 1:
            return None
        return make_mesh(n_model=1, devices=devices)

    def predict_single_npy_array(self, input_image: np.ndarray, image_properties: dict,
                                 segmentation_previous_stage: np.ndarray = None,
                                 output_file_truncated: str = None,
                                 save_or_return_probabilities: bool = False):
        """ref :429-464."""
        from dinounet_tpu.inference.export import (
            convert_predicted_logits_to_segmentation_with_correct_shape,
        )

        preprocessor = self.configuration_manager.preprocessor_class(verbose=self.verbose)
        data, seg = preprocessor.run_case_npy(
            input_image,
            segmentation_previous_stage[None]
            if segmentation_previous_stage is not None else None,
            image_properties, self.plans_manager,
            self.configuration_manager, self.dataset_json,
        )
        if segmentation_previous_stage is not None:
            # cascade: append the preprocessed prev-stage seg as one-hot channels
            from dinounet_tpu.utilities.label_handling import (
                convert_labelmap_to_one_hot,
            )

            data = np.vstack((data, convert_labelmap_to_one_hot(
                seg[0], self.label_manager.foreground_labels, data.dtype)))
        logits = self.predict_logits_from_preprocessed_data(data)
        if output_file_truncated is not None:
            export_prediction_from_logits(
                logits, image_properties, self.configuration_manager, self.plans_manager,
                self.dataset_json, output_file_truncated, save_or_return_probabilities,
            )
            return None
        ret = convert_predicted_logits_to_segmentation_with_correct_shape(
            logits, self.plans_manager, self.configuration_manager, self.label_manager,
            image_properties, return_probabilities=save_or_return_probabilities,
        )
        return ret

    def get_data_iterator_from_raw_npy_data(
            self, image_or_list_of_images,
            segs_from_prev_stage_or_list_of_segs_from_prev_stage,
            properties_or_list_of_properties, truncated_ofname,
            num_processes: int = 3):
        """Preprocessing iterator over in-memory arrays (ref :291-328): yields
        dicts with 'data', 'data_properties', 'ofile'. Host preprocessing runs
        in a bounded-lookahead thread pool (the TPU-native replacement for the
        reference's spawn workers + size-1 queues, data_iterators.py:121-230)."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        images = image_or_list_of_images
        if not isinstance(images, list):
            images = [images]
        segs_prev = segs_from_prev_stage_or_list_of_segs_from_prev_stage
        if segs_prev is None or isinstance(segs_prev, np.ndarray):
            segs_prev = [segs_prev] * len(images)
        props = properties_or_list_of_properties
        if isinstance(props, dict):
            props = [props] * len(images)
        if truncated_ofname is None or isinstance(truncated_ofname, str):
            truncated_ofname = [truncated_ofname] * len(images)

        preprocessor = self.configuration_manager.preprocessor_class(
            verbose=self.verbose_preprocessing)

        def _prep(args):
            img, prev, prop = args
            prop = dict(prop)  # run_case_npy enriches it (crop bbox, shapes)
            data, seg = preprocessor.run_case_npy(
                img, prev[None] if prev is not None else None, prop,
                self.plans_manager, self.configuration_manager,
                self.dataset_json)
            if prev is not None:
                from dinounet_tpu.utilities.label_handling import (
                    convert_labelmap_to_one_hot,
                )

                data = np.vstack((data, convert_labelmap_to_one_hot(
                    seg[0], self.label_manager.foreground_labels, data.dtype)))
            return data, prop

        def gen():
            n_workers = max(1, min(num_processes, len(images)))
            with ThreadPoolExecutor(max_workers=n_workers) as pool:
                jobs = deque(zip(images, segs_prev, props))
                inflight = deque()
                while jobs and len(inflight) < n_workers + 1:
                    inflight.append(pool.submit(_prep, jobs.popleft()))
                for ofile in truncated_ofname:
                    data, prop = inflight.popleft().result()
                    if jobs:
                        inflight.append(pool.submit(_prep, jobs.popleft()))
                    yield {"data": data, "data_properties": prop,
                           "ofile": ofile}

        return gen()

    def predict_from_data_iterator(self, data_iterator,
                                   save_probabilities: bool = False,
                                   num_processes_segmentation_export: int = 3):
        """Predict every item of an iterator of {'data', 'data_properties',
        'ofile'} dicts (ref :348-427): ofile set -> written to disk, else the
        segmentation (or (segmentation, probabilities)) is returned."""
        from dinounet_tpu.inference.export import (
            convert_predicted_logits_to_segmentation_with_correct_shape,
        )

        ret = []
        for item in data_iterator:
            data = item["data"]
            if isinstance(data, str):  # npy spillover file (ref :364-367)
                path = data
                data = np.load(path)
                os.remove(path)
            logits = self.predict_logits_from_preprocessed_data(data)
            properties = item["data_properties"]
            ofile = item.get("ofile")
            if ofile is not None:
                export_prediction_from_logits(
                    logits, properties, self.configuration_manager,
                    self.plans_manager, self.dataset_json, ofile,
                    save_probabilities)
                ret.append(ofile)
            else:
                ret.append(
                    convert_predicted_logits_to_segmentation_with_correct_shape(
                        logits, self.plans_manager, self.configuration_manager,
                        self.label_manager, properties,
                        return_probabilities=save_probabilities))
        return ret

    def predict_from_list_of_npy_arrays(
            self, image_or_list_of_images,
            segs_from_prev_stage_or_list_of_segs_from_prev_stage,
            properties_or_list_of_properties, truncated_ofname,
            num_processes: int = 3, save_probabilities: bool = False,
            num_processes_segmentation_export: int = 3):
        """ref :330-346."""
        iterator = self.get_data_iterator_from_raw_npy_data(
            image_or_list_of_images,
            segs_from_prev_stage_or_list_of_segs_from_prev_stage,
            properties_or_list_of_properties, truncated_ofname, num_processes)
        return self.predict_from_data_iterator(
            iterator, save_probabilities, num_processes_segmentation_export)

    def predict_from_files(self, list_of_lists_or_source_folder,
                           output_folder_or_list_of_truncated_output_files,
                           save_probabilities: bool = False, overwrite: bool = True,
                           num_processes_preprocessing: int = 3,
                           num_processes_segmentation_export: int = 3,
                           folder_with_segs_from_prev_stage: Optional[str] = None,
                           num_parts: int = 1, part_id: int = 0):
        """ref :207-346: preprocessing runs ahead in a bounded thread pool and
        export (host resampling + writing) runs behind in a second bounded
        pool — the device only ever waits on its own predictions, matching
        the reference's spawn export pool + busy-wait backpressure
        (ref :356-381)."""
        if isinstance(output_folder_or_list_of_truncated_output_files, str):
            os.makedirs(output_folder_or_list_of_truncated_output_files, exist_ok=True)
            import shutil

            # save init info next to the predictions (ref :246-255)
            from dinounet_tpu.utilities.json_export import save_json

            save_json(self.dataset_json, os.path.join(
                output_folder_or_list_of_truncated_output_files, "dataset.json"))
            save_json(self.plans_manager.plans, os.path.join(
                output_folder_or_list_of_truncated_output_files, "plans.json"))

        list_of_lists, output_files, seg_prev = self._manage_input_and_output_lists(
            list_of_lists_or_source_folder, output_folder_or_list_of_truncated_output_files,
            folder_with_segs_from_prev_stage, overwrite, part_id, num_parts,
            save_probabilities,
        )
        if len(list_of_lists) == 0:
            return []

        preprocessor = self.configuration_manager.preprocessor_class(
            verbose=self.verbose_preprocessing
        )

        # pipeline host preprocessing with device prediction: a small thread
        # pool preprocesses a BOUNDED number of cases ahead while the TPU runs
        # the current one (the reference's size-1 worker queues,
        # data_iterators.py:17-119, are this backpressure)
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        def _prep(args):
            files, prev = args
            return preprocessor.run_case(
                files, prev, self.plans_manager, self.configuration_manager,
                self.dataset_json,
            )

        if output_files is None:
            output_files = [None] * len(list_of_lists)
        n_workers = max(1, num_processes_preprocessing)
        pool = ThreadPoolExecutor(max_workers=n_workers)
        jobs = deque(zip(list_of_lists, seg_prev))
        inflight = deque()
        while jobs and len(inflight) < n_workers + 1:
            inflight.append(pool.submit(_prep, jobs.popleft()))

        export_pool = ThreadPoolExecutor(
            max_workers=max(1, num_processes_segmentation_export))
        export_futures = deque()
        ret = []

        def _export_named(logits, properties, out_trunc):
            export_prediction_from_logits(
                logits, properties, self.configuration_manager, self.plans_manager,
                self.dataset_json, out_trunc, save_probabilities,
            )
            return out_trunc

        def _export_inmem(logits, properties):
            from dinounet_tpu.inference.export import (
                convert_predicted_logits_to_segmentation_with_correct_shape,
            )

            return convert_predicted_logits_to_segmentation_with_correct_shape(
                logits, self.plans_manager, self.configuration_manager,
                self.label_manager, properties,
                return_probabilities=save_probabilities,
            )

        for out_trunc, prev in zip(output_files, seg_prev):
            data, seg, properties = inflight.popleft().result()
            if jobs:
                inflight.append(pool.submit(_prep, jobs.popleft()))
            if prev is not None:
                # cascade: previous-stage labelmap was preprocessed as the seg;
                # feed it to the net as one-hot channels (ref data_iterators.py:37-39)
                from dinounet_tpu.utilities.label_handling import (
                    convert_labelmap_to_one_hot,
                )

                data = np.vstack((data, convert_labelmap_to_one_hot(
                    seg[0], self.label_manager.foreground_labels, data.dtype)))
            logits = self.predict_logits_from_preprocessed_data(data)
            if out_trunc is not None:
                export_futures.append(
                    export_pool.submit(_export_named, logits, properties, out_trunc))
            else:
                export_futures.append(
                    export_pool.submit(_export_inmem, logits, properties))
            # backpressure (the reference's check_workers_alive_and_busy):
            # don't let exports pile up unboundedly behind the device
            while len(export_futures) > 2 * max(1, num_processes_segmentation_export):
                ret.append(export_futures.popleft().result())
        while export_futures:
            ret.append(export_futures.popleft().result())
        pool.shutdown(wait=False)
        export_pool.shutdown(wait=True)
        return ret


def predict_entry_point():
    """Prediction CLI (ref predict_from_raw_data.py:779-870, nnUNetv2_predict)."""
    import argparse

    from dinounet_tpu.utilities.misc import (
        convert_identifier_to_trained_model_output_folder,
        maybe_convert_to_dataset_name,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("-i", type=str, required=True, help="input folder")
    parser.add_argument("-o", type=str, required=True, help="output folder")
    parser.add_argument("-d", type=str, required=True, help="dataset name or id")
    parser.add_argument("-p", type=str, default="nnUNetPlans")
    parser.add_argument("-tr", type=str, default="nnUNetTrainer")
    parser.add_argument("-c", type=str, required=True, help="configuration")
    parser.add_argument("-f", nargs="+", type=str, default=(0, 1, 2, 3, 4))
    parser.add_argument("-step_size", type=float, default=0.5)
    parser.add_argument("--disable_tta", action="store_true")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--save_probabilities", action="store_true")
    parser.add_argument("--continue_prediction", action="store_true")
    parser.add_argument("-chk", type=str, default="checkpoint_final.pth")
    parser.add_argument("-npp", type=int, default=3)
    parser.add_argument("-nps", type=int, default=3)
    parser.add_argument("-prev_stage_predictions", type=str, default=None)
    parser.add_argument("-num_parts", type=int, default=1)
    parser.add_argument("-part_id", type=int, default=0)
    parser.add_argument("-device", type=str, default=None,
                        help="compat flag; JAX owns device selection")
    args = parser.parse_args()
    folds = [f if f == "all" else int(f) for f in args.f]

    model_folder = convert_identifier_to_trained_model_output_folder(
        maybe_convert_to_dataset_name(args.d), args.tr, args.p, args.c)

    predictor = nnUNetPredictor(
        tile_step_size=args.step_size, use_gaussian=True,
        use_mirroring=not args.disable_tta, verbose=args.verbose,
    )
    predictor.initialize_from_trained_model_folder(model_folder, folds, args.chk)
    predictor.predict_from_files(
        args.i, args.o, save_probabilities=args.save_probabilities,
        overwrite=not args.continue_prediction,
        num_processes_preprocessing=args.npp,
        num_processes_segmentation_export=args.nps,
        folder_with_segs_from_prev_stage=args.prev_stage_predictions,
        num_parts=args.num_parts, part_id=args.part_id,
    )


def predict_entry_point_modelfolder():
    """Prediction CLI taking an explicit model folder (ref
    predict_from_raw_data.py:779-871) — for when the nnUNet_results env var
    is not set."""
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("-i", type=str, required=True, help="input folder")
    parser.add_argument("-o", type=str, required=True, help="output folder")
    parser.add_argument("-m", type=str, required=True,
                        help="trained model folder (…/TrainerName__plans__config)")
    parser.add_argument("-f", nargs="+", type=str, default=(0, 1, 2, 3, 4))
    parser.add_argument("-step_size", type=float, default=0.5)
    parser.add_argument("--disable_tta", action="store_true")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--save_probabilities", action="store_true")
    parser.add_argument("--continue_prediction", action="store_true")
    parser.add_argument("-chk", type=str, default="checkpoint_final.pth")
    parser.add_argument("-npp", type=int, default=3)
    parser.add_argument("-nps", type=int, default=3)
    parser.add_argument("-prev_stage_predictions", type=str, default=None)
    parser.add_argument("-device", type=str, default=None,
                        help="compat flag; JAX owns device selection")
    args = parser.parse_args()
    folds = [f if f == "all" else int(f) for f in args.f]

    predictor = nnUNetPredictor(
        tile_step_size=args.step_size, use_gaussian=True,
        use_mirroring=not args.disable_tta, verbose=args.verbose,
    )
    predictor.initialize_from_trained_model_folder(args.m, folds, args.chk)
    predictor.predict_from_files(
        args.i, args.o, save_probabilities=args.save_probabilities,
        overwrite=not args.continue_prediction,
        num_processes_preprocessing=args.npp,
        num_processes_segmentation_export=args.nps,
        folder_with_segs_from_prev_stage=args.prev_stage_predictions,
    )


if __name__ == "__main__":
    import sys as _sys

    # `python -m dinounet_tpu.inference.predictor from-folder ...` routes to
    # the explicit-model-folder CLI (ref predict_from_raw_data.py:779-871 has
    # two console entry points; module execution multiplexes them)
    if len(_sys.argv) > 1 and _sys.argv[1] == "from-folder":
        _sys.argv = [_sys.argv[0]] + _sys.argv[2:]
        predict_entry_point_modelfolder()
    else:
        predict_entry_point()
