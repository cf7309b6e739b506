"""Character-feature index build CLI.

Public surface matches gen_cfeatures.py:461-483:

    python -m anime_illust_image_searcher_tpu.cli.gen_cfeatures --dir D [--after YYYY-MM-DD]

Behavior (gen_cfeatures.py:337-459):
  - recursive listing + optional ctime --after filter
  - --after: timestamped backup dir for all charactor-featues-idx* files, then the old
    index rows are copied into revision N+1 and new rows append there
  - batched CCIP feature extraction; paths appended to charactor-featues-idx.csv
    (reference misspelling preserved); vectors into the revisioned similarity index
  - FIXED vs reference: tail batch processed, deterministic listing order (QUIRKS.md
    #1/#13); index writes stay on the main thread since add_documents is O(memcpy)
    here, not a gensim shard rebuild
"""

from __future__ import annotations

import argparse
import datetime
import sys
import time
from typing import Optional

import numpy as np

from ..config import CCIPConfig, DEFAULT_CONFIG
from ..data.ingest import PrefetchLoader, filter_files_by_date, list_files_recursive
from ..index import artifacts
from ..index.similarity import SimilarityIndex
from ..models.ccip import CCIPPredictor
from ..utils.progress import ProgressMeter


class Predictor(CCIPPredictor):
    """Directory-processing wrapper (reference Predictor — gen_cfeatures.py:68,337)."""

    def __init__(self, config: CCIPConfig = DEFAULT_CONFIG.ccip, **kw) -> None:
        super().__init__(config=config, **kw)
        self.cindex: Optional[SimilarityIndex] = None

    def get_current_cfeature_number(self) -> int:
        return artifacts.get_current_cfeature_number()

    def process_directory(
        self, dir_path: str, added_date: Optional[datetime.date] = None
    ) -> None:
        cfg = self.config
        # Extraction stamp for every row THIS run adds: the CCIP reranker's
        # row-gather path compares file mtimes against the per-row stamp (not
        # the index save time, which postdates the extraction of every row)
        # to decide whether a stored feature is fresh. Rows copied from an
        # older revision keep their own stamps (SimilarityIndex.extend_from).
        build_started = time.time()
        file_list = list_files_recursive(dir_path)
        print(f"{len(file_list)} files found")

        index_name = artifacts.cfeatures_index_name(0)
        if added_date is not None:
            file_list = filter_files_by_date(file_list, added_date)
            print(f"{len(file_list)} files found after {added_date}")

            backup_dir = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
            copied = artifacts.backup_cfeature_indexes(backup_dir)
            for name in copied:
                print(f"Backed up {name} to {backup_dir}")

            max_number = self.get_current_cfeature_number()
            print("copying index files to new index files")
            old_index = SimilarityIndex.load(
                artifacts.cfeatures_index_name(max_number), mmap=None
            )
            index_name = artifacts.cfeatures_index_name(max_number + 1)
            self.cindex = SimilarityIndex(index_name, num_features=cfg.feature_dim)
            if len(old_index):
                # verbatim copy (rows AND pre-normalization norms/stamps) —
                # re-adding the unit rows would record norm 1.0 for every
                # copied image and restamp it as extracted now
                self.cindex.extend_from(old_index)
            print("copying index files to new index files done")
        elif SimilarityIndex.exists(index_name):
            # append mode on rev 0, like gensim Similarity reopened by name
            self.cindex = SimilarityIndex.load(index_name, mmap=None)

        self.load_model()
        self.threshold = self.ccip_default_threshold()
        out = open(artifacts.CFEATURES_CSV, "a", encoding="utf-8")

        if self.cindex is None:
            self.cindex = SimilarityIndex(index_name, num_features=cfg.feature_dim)

        from PIL import Image

        meter = ProgressMeter(cfg.progress_interval)
        loader = PrefetchLoader(
            file_list,
            size=cfg.image_size,
            batch_size=cfg.batch_size,
            workers=cfg.decode_workers,
            pad_to_square=False,
            resample=Image.BILINEAR,
        )
        def flush(pending) -> None:
            pbatch, dev = pending
            feats = np.asarray(dev)[: pbatch.valid]
            for path in pbatch.paths:
                out.write(path + "\n")
            self.cindex.add_documents(list(feats), stamp=build_started)
            meter.add(pbatch.valid)

        try:
            # depth-1 pipeline like the tagging CLIs: dispatch batch N, then sync
            # and index batch N-1 while the device runs
            pending = None
            for batch in loader:
                dev = self.ccip_extract_device(batch.images)
                if pending is not None:
                    flush(pending)
                pending = (batch, dev)
            if pending is not None:
                flush(pending)
        finally:
            out.close()
        stamped = np.asarray(self.cindex.stamps)
        stamped = stamped[stamped > 0]
        self.cindex.meta["build_started"] = float(
            min(stamped.min(), build_started)) if len(stamped) else build_started
        self.cindex.save(index_name)
        meter.report(final=True)
        loader.report_failures()


def main(arg_str: list) -> None:
    from ..utils.jax_setup import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir", nargs=1, required=True, help="tagging target directory path")
    parser.add_argument(
        "--after", nargs=1,
        help="tagging new images after this date (mtime attribute). Format: YYYY-MM-DD",
    )
    parser.add_argument("--batch-size", type=int, default=None, help="device batch size")
    parser.add_argument("--model-dir", default=None,
                        help="converted CCIP checkpoint (tools/convert_ccip.py); "
                             "defaults to $AIIS_CCIP_MODEL_DIR, else random weights")
    parser.add_argument("--model-repo", default=None, metavar="REPO_ID",
                        help="HF Hub repo to download + convert at runtime "
                             "(e.g. deepghs/ccip_onnx); networked deployments only")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard feature batches across all visible chips")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="write a jax.profiler trace of the run to DIR")
    parser.add_argument("--decode-workers", type=int, default=None,
                        help="host decode threads (default 8, clamped to the "
                             "core count; raise on many-core TPU-VM hosts)")
    args = parser.parse_args(arg_str)

    cfg = DEFAULT_CONFIG.ccip
    if args.batch_size is not None:
        if args.batch_size < 1:
            parser.error(f"--batch-size must be >= 1, got {args.batch_size}")
        import dataclasses

        cfg = dataclasses.replace(cfg, batch_size=args.batch_size)
    if args.decode_workers is not None:
        if args.decode_workers < 1:
            parser.error(f"--decode-workers must be >= 1, got {args.decode_workers}")
        import dataclasses

        cfg = dataclasses.replace(cfg, decode_workers=args.decode_workers)

    model_dir = args.model_dir
    if model_dir is None and args.model_repo:
        from ..models.hub import fetch_ccip_repo

        model_dir = fetch_ccip_repo(args.model_repo)
        print(f"ccip model converted to {model_dir}")

    mesh = None
    if args.data_parallel:
        import dataclasses

        import jax

        from ..parallel.distributed import initialize
        from ..parallel.mesh import make_mesh

        initialize()
        n = len(jax.devices())
        if cfg.batch_size % n:
            cfg = dataclasses.replace(cfg, batch_size=(cfg.batch_size + n - 1) // n * n)
        mesh = make_mesh()
        print(f"cfeatures data-parallel over {n} devices, batch {cfg.batch_size}")

    predictor = Predictor(config=cfg, model_dir=model_dir, mesh=mesh)
    after_date = None
    if args.after is not None:
        try:
            after_date = datetime.datetime.strptime(args.after[0], "%Y-%m-%d").date()
        except Exception as e:  # noqa: BLE001
            print("%s: %s" % (type(e), str(e)))
            print("Invalid date format. format is YYYY-MM-DD")
            sys.exit(1)
    from ..utils.profiling import trace as _profiler_trace

    with _profiler_trace(args.profile):
        if after_date is not None:
            predictor.process_directory(args.dir[0], after_date)
        else:
            predictor.process_directory(args.dir[0])


def _console() -> None:
    """pip console-script entry (pyproject [project.scripts])."""
    import sys as _sys

    main(_sys.argv[1:])

if __name__ == "__main__":
    main(sys.argv[1:])
