"""Index build CLI — Doc2Vec PV-DBOW training + similarity index + BM25 artifacts.

TPU-native rebuild of the reference's genmodel.py. Same public surface:

    python -m anime_illust_image_searcher_tpu.cli.genmodel [--update]

Same artifact chain (genmodel.py:21-43,84-97,155-177):
  tags-wd-tagger.txt -> tags-wd-tagger_doc2vec_idx.csv (docs with >= 3 tags, in order)
                     -> doc2vec_dictionary, doc2vec_model, doc2vec_index
                     -> bm25_corpus / bm25_idf / bm25_avgdl / bm25_D / bm25_doc_lengths

Same --update semantics: the idx csv is backed up, only docs beyond the old line count
get new vectors appended to the similarity index, the dictionary is NOT extended, and
BM25 is always rebuilt from the full corpus (genmodel.py:123-148,177 — see QUIRKS.md).
"""

from __future__ import annotations

import argparse
import logging
import sys
from typing import List, Tuple

from ..config import DEFAULT_CONFIG, Doc2VecConfig
from ..index import artifacts
from ..index.bm25_index import (
    BM25DeviceIndex, build_bm25_stats, save_bm25_artifacts,
)
from ..index.dictionary import TagDictionary
from ..index.similarity import SimilarityIndex
from ..models.doc2vec import Doc2VecModel


def read_documents_and_gen_idx_text(file_path: str) -> Tuple[List[List[str]], List[str]]:
    """Read the tag file, keep docs with >= 3 tags, and write the docid-ordered idx csv
    (reference: genmodel.py:21-43). Returns (token docs, original lines kept)."""
    processed_docs: List[List[str]] = []
    kept_lines: List[str] = []
    idx_text_fpath = file_path.split(".")[0] + "_doc2vec_idx.csv"
    with open(idx_text_fpath, "w", encoding="utf-8") as idx_f:
        with open(file_path, "r", encoding="utf-8") as f:
            for line in f:
                row = line.strip().split(",")
                tokens = row[1:]  # drop the file-path element
                if tokens and len(tokens) >= 3:
                    processed_docs.append(tokens)
                    kept_lines.append(line)
                    idx_f.write(line)
    return processed_docs, kept_lines


def main(arg_str: List[str]) -> None:
    from ..utils.jax_setup import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    logging.basicConfig(
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s", level=logging.INFO
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("--update", action="store_true", help="add new images to index")
    parser.add_argument("--epochs", type=int, default=None,
                        help="override Doc2Vec training epochs (default 100)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard Doc2Vec training batches across all visible chips")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="write a jax.profiler trace of the run to DIR")
    parser.add_argument("--no-reuse-model", action="store_true",
                        help="always retrain, even when a finished doc2vec_model "
                             "trained from exactly this corpus/config already "
                             "exists (reuse is bit-identical to retraining — "
                             "training is seeded and deterministic — and is how "
                             "a build that crashed after training skips the "
                             "training bill on rerun)")
    parser.add_argument("--checkpoint-every", type=int, default=10, metavar="N",
                        help="snapshot training state every N epochs for crash "
                             "resume (0 disables; default 10). Each snapshot "
                             "ships the full doc-vector table device-to-host "
                             "(~1.2 GB at 1M docs), so raise N or disable on "
                             "hosts with slow device links")
    args = parser.parse_args(arg_str)

    mesh = None
    if args.data_parallel:
        import jax

        from ..parallel.distributed import initialize
        from ..parallel.mesh import make_mesh

        initialize()
        mesh = make_mesh()
        print(f"doc2vec training + inference data-parallel over "
              f"{len(jax.devices())} devices")

    if args.update:
        import os

        if os.path.exists(artifacts.DOC2VEC_IDX_CSV):
            artifacts.backup_file(artifacts.DOC2VEC_IDX_CSV, artifacts.DOC2VEC_IDX_CSV_BAK)
        else:
            print(f"{artifacts.DOC2VEC_IDX_CSV} not found")
            sys.exit(1)

    import os

    if not os.path.exists(artifacts.TAGS_FILE):
        print(f"{artifacts.TAGS_FILE} not found — run tagging first")
        sys.exit(1)

    processed_docs, _ = read_documents_and_gen_idx_text(artifacts.TAGS_FILE)
    if not processed_docs:
        print(f"no documents with >= 3 tags in {artifacts.TAGS_FILE}; nothing to index")
        sys.exit(1)

    cfg: Doc2VecConfig = DEFAULT_CONFIG.doc2vec
    if args.epochs is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, epochs=args.epochs, infer_epochs=args.epochs)

    from ..utils.profiling import trace as _profiler_trace

    with _profiler_trace(args.profile):
        _build(args, cfg, mesh, processed_docs)


def _infer_vectors_resumable(model: Doc2VecModel, docs) -> "np.ndarray":
    """Whole-corpus inference with crash resume for large builds.

    Per-doc inference is deterministic and batch-invariant (seeded from token
    ids; pinned by tests), so slicing the corpus and persisting each finished
    slice is result-identical to one ``infer_vectors`` call — and a build
    that dies mid-pass (≈11 min of the 67-min 1M build; the relay-crash
    window that remains after finished-model reuse) resumes from the last
    completed slice instead of re-inferring everything. Progress lives in
    ``doc2vec_model.infer_progress/`` keyed by (model identity, cfg, docs):
    any mismatch recomputes from scratch; the caller removes the directory
    once the downstream index artifact is safely written.
    AIIS_INFER_RESUME_SLICE sets the slice size (docs; 0 disables)."""
    import hashlib
    import json
    import os

    import numpy as np

    n = len(docs)
    slice_docs = int(os.environ.get("AIIS_INFER_RESUME_SLICE", "131072"))
    if slice_docs <= 0 or n <= slice_docs:
        return model.infer_vectors(docs)

    h = hashlib.blake2b(digest_size=16)
    ident = model.train_fp or hashlib.blake2b(
        np.ascontiguousarray(model.syn1neg).tobytes(), digest_size=16
    ).hexdigest()
    h.update(ident.encode())
    h.update(repr(model.cfg).encode())
    h.update(np.int64(n).tobytes())
    h.update(np.int64(slice_docs).tobytes())
    for doc in docs:
        for t in doc:
            h.update(t.encode())
            h.update(b"\0")
        h.update(b"\1")
    fp = h.hexdigest()

    d = _infer_progress_dir()
    manifest_path = os.path.join(d, "manifest.json")
    done: set = set()
    if os.path.exists(manifest_path):
        try:
            with open(manifest_path, "r", encoding="ascii") as f:
                manifest = json.load(f)
            if manifest.get("fp") == fp:
                done = set(manifest.get("done", []))
            else:
                print("doc2vec: inference progress is from a different "
                      "model/corpus — recomputing")
                # Drop the stale slices now, not on build success: repeated
                # crashed builds over changing corpora otherwise accumulate
                # orphaned multi-hundred-MB slice_*.npy files (ADVICE r4).
                import shutil

                shutil.rmtree(d, ignore_errors=True)
        except (OSError, ValueError):
            pass
    os.makedirs(d, exist_ok=True)

    out = np.empty((n, model.cfg.vector_size), np.float32)
    starts = list(range(0, n, slice_docs))
    resumed = 0
    for i, s in enumerate(starts):
        e = min(s + slice_docs, n)
        slice_path = os.path.join(d, f"slice_{i}.npy")
        if i in done and os.path.exists(slice_path):
            try:
                arr = np.load(slice_path)
                if arr.shape == (e - s, model.cfg.vector_size):
                    out[s:e] = arr
                    resumed += 1
                    continue
            except (OSError, ValueError):
                pass  # unreadable slice: recompute it
        out[s:e] = model.infer_vectors(docs[s:e])
        tmp = f"{slice_path}.tmp{os.getpid()}"
        with open(tmp, "wb") as f:  # file object: np.save can't append .npy
            np.save(f, out[s:e])
        os.replace(tmp, slice_path)
        done.add(i)
        tmp_m = f"{manifest_path}.tmp{os.getpid()}"
        with open(tmp_m, "w", encoding="ascii") as f:
            json.dump({"fp": fp, "done": sorted(done)}, f)
        os.replace(tmp_m, manifest_path)
    if resumed:
        print(f"doc2vec: resumed inference — {resumed}/{len(starts)} slices "
              "loaded from progress")
    return out


def _infer_progress_dir() -> str:
    return artifacts.DOC2VEC_MODEL + ".infer_progress"


def _clear_infer_progress() -> None:
    import shutil

    shutil.rmtree(_infer_progress_dir(), ignore_errors=True)


def _ensure_serve_cache(model: Doc2VecModel) -> None:
    """Refresh the mmap'd serving sidecar only if it doesn't match the (reused,
    untouched) model pickle — e.g. the prior run crashed before writing it."""
    from ..utils.sidecar_cache import read_manifest

    path = artifacts.DOC2VEC_MODEL
    try:
        manifest = read_manifest(Doc2VecModel.serve_cache_dir(path))
        if (manifest is not None
                and manifest.get("fp") == Doc2VecModel._serve_cache_fp(path)):
            return
        model.write_serve_cache(path)
    except OSError:
        pass


def _build(args, cfg, mesh, processed_docs) -> None:
    if args.update:
        if args.epochs is not None:
            # Appended vectors must be inferred with the stored model's epochs or the
            # index rows become inconsistent with query-time re-inference.
            print("WARNING: --epochs is ignored with --update (the loaded model's "
                  "training/inference settings apply); rebuild without --update to "
                  "change epochs")
        dictionary = TagDictionary.load(artifacts.DOC2VEC_DICTIONARY)
        model = Doc2VecModel.load(artifacts.DOC2VEC_MODEL)
        model.mesh = mesh  # --data-parallel shards the append-inference pass too
        index = SimilarityIndex.load(artifacts.DOC2VEC_INDEX, mmap=None)
        before = artifacts.count_non_empty_lines(artifacts.DOC2VEC_IDX_CSV_BAK)
        print(f"update index: {len(processed_docs) - before} files")
        new_docs = processed_docs[before:]
    else:
        dictionary = TagDictionary(processed_docs)
        dictionary.save(artifacts.DOC2VEC_DICTIONARY)
        # checkpoint_path is passed even with snapshots disabled
        # (--checkpoint-every 0): it also names the finished artifact that a
        # rerun on identical inputs can reuse instead of retraining.
        model = Doc2VecModel.train(
            processed_docs, cfg, log_every=10,
            checkpoint_path=artifacts.DOC2VEC_MODEL,
            checkpoint_every=args.checkpoint_every,
            mesh=mesh,
            reuse_finished=not args.no_reuse_model,
        )
        if getattr(model, "reused_finished", False):
            # the on-disk pickle IS this model — rewriting ~GBs would only
            # invalidate the serve cache it already has
            _ensure_serve_cache(model)
        else:
            model.save(artifacts.DOC2VEC_MODEL)
            # Pre-derive the mmap'd serving sidecar (skips the big unpickle at
            # engine start; ARCHITECTURE §3). Best-effort — serving rebuilds it.
            try:
                model.write_serve_cache(artifacts.DOC2VEC_MODEL)
            except OSError:
                pass
        index = None
        new_docs = processed_docs

    # Per-doc infer_vector, batched on device (reference loops one doc at a time —
    # genmodel.py:168-173).
    if new_docs:
        vectors = _infer_vectors_resumable(model, new_docs)
        if index is None:
            index = SimilarityIndex(artifacts.DOC2VEC_INDEX, num_features=cfg.vector_size)
        index.add_documents(list(vectors))
    # new_docs is never empty here (main() exits on an empty corpus; --update
    # loads an existing index), so index is always set by this point
    assert index is not None
    index.save(artifacts.DOC2VEC_INDEX)
    # the inference results are now durable downstream; drop the slice files
    _clear_infer_progress()

    # BM25 is always regenerated from the full corpus (genmodel.py:134,177).
    stats = build_bm25_stats(processed_docs, dictionary)
    save_bm25_artifacts(stats)
    # Pre-derive the mmap'd serving cache while the stats are in memory, so the
    # first engine start skips the corpus unpickle + device-form build
    # (~170 s at 1M docs; ARCHITECTURE §3). Best-effort: serving rebuilds it.
    try:
        BM25DeviceIndex.from_stats(
            stats, vocab_size=len(dictionary), cfg=DEFAULT_CONFIG.bm25
        ).write_cache(".", cfg=DEFAULT_CONFIG.bm25)
    except OSError:
        pass


def _console() -> None:
    """pip console-script entry (pyproject [project.scripts])."""
    import sys as _sys

    main(_sys.argv[1:])

if __name__ == "__main__":
    main(sys.argv[1:])
