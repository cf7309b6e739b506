"""Tagging CLI — batched WD-EVA02 ViT tagging of an image directory.

Public surface matches the reference (tagging.py:361-383):

    python -m anime_illust_image_searcher_tpu.cli.tagging --dir D [--after YYYY-MM-DD]

plus TPU-era extras: --model-dir (local converted checkpoint; zero-egress environments
can't pull from HF at runtime), --batch-size.

Behavior parity (see QUIRKS.md):
  - output appended to tags-wd-tagger.txt, one ``path,tag,...`` line per image (#2)
  - --after filters by st_ctime date and backs up the tag file first (#3)
  - per-image decode failures are skipped and counted, never fatal
  - FIXED vs reference: the tail batch is padded and processed instead of dropped (#1),
    and output order is deterministic listing order (#13)
"""

from __future__ import annotations

import argparse
import datetime
import sys
from typing import Optional

from ..config import DEFAULT_CONFIG, TaggerConfig
from ..data.ingest import PrefetchLoader, filter_files_by_date, list_files_recursive
from ..index import artifacts
from ..models.tagger import TaggerPredictor
from ..utils.progress import ProgressMeter


class Predictor(TaggerPredictor):
    """Directory-processing wrapper keeping the reference's entry-point API
    (``Predictor().process_directory(dir, added_date)`` — tagging.py:276)."""

    def process_directory(
        self, dir_path: str, added_date: Optional[datetime.date] = None
    ) -> None:
        cfg: TaggerConfig = self.config
        file_list = list_files_recursive(dir_path, cfg.extensions)
        print(f"{len(file_list)} files found")

        if added_date is not None:
            file_list = filter_files_by_date(file_list, added_date)
            print(f"{len(file_list)} files found after {added_date}")
            import os

            if os.path.exists(cfg.output_file):
                artifacts.backup_file(cfg.output_file)
            else:
                print(f"{cfg.output_file} not found")
                sys.exit(1)

        self.load_model()
        out = open(cfg.output_file, "a", encoding="utf-8")
        meter = ProgressMeter(cfg.progress_interval)
        loader = PrefetchLoader(
            file_list,
            size=cfg.image_size,
            batch_size=cfg.batch_size,
            workers=cfg.decode_workers,
            pad_to_square=True,
        )
        def flush(pending) -> None:
            pbatch, devs = pending
            results = self.finalize(
                devs,
                cfg.general_thresh, cfg.general_mcut_enabled,
                cfg.character_thresh, cfg.character_mcut_enabled,
            )
            for path, line in zip(pbatch.paths, results[: pbatch.valid]):
                out.write(path + "," + line + "\n")
            meter.add(pbatch.valid)

        pending = None
        try:
            # depth-1 pipeline: dispatch batch N to the device, then assemble batch
            # N-1's CSV lines on the host while the TPU runs.
            for batch in loader:
                devs = self.predict_device(batch.images)
                if pending is not None:
                    flush(pending)
                pending = (batch, devs)
            if pending is not None:
                flush(pending)
        finally:
            out.close()
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
    parser.add_argument(
        "--model-dir", default=None,
        help="local checkpoint dir with model.safetensors + selected_tags.csv "
             "(converted from SmilingWolf/wd-eva02-large-tagger-v3); "
             "defaults to $AIIS_MODEL_DIR, else random weights",
    )
    parser.add_argument(
        "--model-repo", default=None, metavar="REPO_ID",
        help="HF Hub repo to download at runtime (e.g. "
             "SmilingWolf/wd-eva02-large-tagger-v3); networked deployments only",
    )
    parser.add_argument("--batch-size", type=int, default=None, help="device batch size")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="write a jax.profiler trace of the run to DIR")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard batches across all visible chips (multi-chip dp)")
    parser.add_argument("--scaled-decode", action="store_true",
                        help="libjpeg DCT-domain scaled decode: ~3x faster host "
                             "ingest (bench_ingest.py), pixels differ slightly "
                             "from the full-decode path (mean ~1.4/255); same "
                             "as AIIS_SCALED_DECODE=1")
    parser.add_argument("--decode-workers", type=int, default=None,
                        help="host decode threads (default 8, clamped to the "
                             "core count; raise on many-core TPU-VM hosts)")
    args = parser.parse_args(arg_str)
    if args.scaled_decode:
        import os as _os

        _os.environ["AIIS_SCALED_DECODE"] = "1"

    cfg = DEFAULT_CONFIG.tagger
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

    mesh = None
    if args.data_parallel:
        import jax

        from ..parallel.distributed import initialize
        from ..parallel.mesh import make_mesh

        initialize()
        n = len(jax.devices())
        if cfg.batch_size % n:
            import dataclasses

            cfg = dataclasses.replace(
                cfg, batch_size=(cfg.batch_size + n - 1) // n * n
            )
        mesh = make_mesh()
        print(f"data-parallel over {n} devices, batch {cfg.batch_size}")

    model_dir = args.model_dir
    if model_dir is None and args.model_repo:
        from ..models.hub import fetch_tagger_repo

        model_dir = fetch_tagger_repo(args.model_repo)
        print(f"model fetched to {model_dir}")

    predictor = Predictor(config=cfg, model_dir=model_dir, mesh=mesh)
    after_date = None
    if args.after is not None:
        try:
            after_date = datetime.datetime.strptime(args.after[0], "%Y-%m-%d").date()
        except Exception as e:  # noqa: BLE001
            print("%s: %s" % (type(e), str(e)))
            print("Invalid date format. format is YYYY-MM-DD")
            sys.exit(1)

    from ..utils.profiling import trace

    with trace(args.profile):
        predictor.process_directory(args.dir[0], after_date)


def _console() -> None:
    """pip console-script entry (pyproject [project.scripts])."""
    import sys as _sys

    main(_sys.argv[1:])

if __name__ == "__main__":
    main(sys.argv[1:])
