"""One-command release checklist: every network-gated validation, in order.

This environment has zero egress, so the real-weight work (VERDICT r2 missing
#1-#4) is staged but unexecuted. On a machine WITH network access (and the
optional oracle deps), this script chains the whole release validation:

    python tools/release_checklist.py --workdir /tmp/aiis_release

Steps (each skippable/resumable; state in <workdir>/release_state.json):

  1. fetch-tagger      snapshot_download SmilingWolf/wd-eva02-large-tagger-v3
  2. convert-tagger    tools/convert_checkpoint.py -> wd-eva02-v3/
  3. tagger-parity     tools/parity_harness.py vs the timm oracle (per-layer)
  4. quant-report      tools/quant_report.py --model-dir (int8 gate)
  5. fetch-ccip        hf_hub_download deepghs/ccip_onnx (feat/metrics/json)
  6. convert-ccip      tools/convert_ccip.py (incl. the metric-graph verdict;
                       learned metrics are shipped + converted automatically)
  7. reference-run     record golden fixtures from the REFERENCE implementation
                       on a fixed corpus (requires its repo + torch/gensim env;
                       emits the exact commands, verifies the artifacts exist)
  8. gensim-import     tools/import_gensim_artifacts.py on the reference run's
                       artifacts (requires gensim installed)
  9. pyinstaller-build packaging/build.sh (requires pyinstaller)
 10. test-suite        pytest tests/ with AIIS_MODEL_DIR/AIIS_CCIP_MODEL_DIR
                       pointing at the converted checkpoints

In THIS environment run ``--check-wiring``: it verifies each step's entry point
exists, imports, and parses its CLI — the wiring smoke test the release relies
on (tests/test_release_checklist.py gates it).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TAGGER_REPO = "SmilingWolf/wd-eva02-large-tagger-v3"
CCIP_REPO = "deepghs/ccip_onnx"
CCIP_MODEL = "ccip-caformer-24-randaug-pruned"
CCIP_FILES = ("model_feat.onnx", "model_metrics.onnx", "metrics.json")


def _tool(name: str) -> str:
    return os.path.join(REPO, "tools", name)


def _pythonpath() -> str:
    """REPO prepended to any existing PYTHONPATH — never clobber it (on TPU
    hosts it carries the axon site; CLAUDE.md rule)."""
    existing = os.environ.get("PYTHONPATH")
    return f"{REPO}:{existing}" if existing else REPO


def _have_module(name: str) -> bool:
    return importlib.util.find_spec(name) is not None


def _run(cmd, **kw) -> int:
    print("+", " ".join(str(c) for c in cmd))
    return subprocess.run([str(c) for c in cmd], **kw).returncode


class Step:
    def __init__(self, name, description, needs_modules=(), scripts=(),
                 run=None, manual=None):
        self.name = name
        self.description = description
        self.needs_modules = tuple(needs_modules)
        self.scripts = tuple(scripts)   # files that must exist + import/parse
        self.run = run                  # callable(workdir) -> bool
        self.manual = manual            # printed instructions when not runnable

    def missing_modules(self):
        return [m for m in self.needs_modules if not _have_module(m)]

    def check_wiring(self) -> list:
        """Return a list of wiring problems (empty = wired)."""
        problems = []
        for script in self.scripts:
            path = script if os.path.isabs(script) else os.path.join(REPO, script)
            if not os.path.exists(path):
                problems.append(f"missing file: {script}")
                continue
            if path.endswith(".py"):
                rc = subprocess.run(
                    [sys.executable, path, "--help"], capture_output=True,
                    cwd=REPO, env={**os.environ, "PYTHONPATH": _pythonpath()},
                ).returncode
                if rc != 0:
                    problems.append(f"--help failed for {script}")
        return problems


def build_steps():
    def fetch_tagger(wd):
        from huggingface_hub import snapshot_download

        dest = snapshot_download(TAGGER_REPO)
        json.dump({"snapshot": dest}, open(os.path.join(wd, "tagger_src.json"), "w"))
        return True

    def convert_tagger(wd):
        src = json.load(open(os.path.join(wd, "tagger_src.json")))["snapshot"]
        return _run([sys.executable, _tool("convert_checkpoint.py"),
                     "--src", src, "--dest", os.path.join(wd, "wd-eva02-v3")],
                    cwd=REPO) == 0

    def tagger_parity(wd):
        img = os.path.join(wd, "parity_probe.png")
        if not os.path.exists(img):
            import numpy as np
            from PIL import Image

            rng = np.random.RandomState(0)
            Image.fromarray(rng.randint(0, 255, (600, 450, 3), np.uint8)).save(img)
        return _run([sys.executable, _tool("parity_harness.py"),
                     "--model-dir", os.path.join(wd, "wd-eva02-v3"),
                     "--image", img], cwd=REPO) == 0

    def quant_report(wd):
        return _run([sys.executable, _tool("quant_report.py"),
                     "--model-dir", os.path.join(wd, "wd-eva02-v3")],
                    cwd=REPO) == 0

    def fetch_ccip(wd):
        from huggingface_hub import hf_hub_download

        paths = {}
        for f in CCIP_FILES:
            paths[f] = hf_hub_download(CCIP_REPO, f"{CCIP_MODEL}/{f}")
        json.dump(paths, open(os.path.join(wd, "ccip_src.json"), "w"))
        return True

    def convert_ccip(wd):
        paths = json.load(open(os.path.join(wd, "ccip_src.json")))
        return _run([sys.executable, _tool("convert_ccip.py"),
                     "--feat", paths["model_feat.onnx"],
                     "--metrics", paths["model_metrics.onnx"],
                     "--metrics-json", paths["metrics.json"],
                     "--dest", os.path.join(wd, "ccip")], cwd=REPO) == 0

    def reference_run(wd):
        ref_dir = os.environ.get("AIIS_REFERENCE_RUN_DIR",
                                 os.path.join(wd, "reference_run"))
        needed = ["tags-wd-tagger.txt", "doc2vec_model", "doc2vec_dictionary",
                  "bm25_corpus", "bm25_idf"]
        missing = [f for f in needed
                   if not os.path.exists(os.path.join(ref_dir, f))]
        if missing:
            print(f"reference artifacts missing in {ref_dir}: {missing}")
            print(REFERENCE_RUN_INSTRUCTIONS.format(ref_dir=ref_dir))
            return False
        return True

    def gensim_import(wd):
        ref_dir = os.environ.get("AIIS_REFERENCE_RUN_DIR",
                                 os.path.join(wd, "reference_run"))
        return _run([sys.executable, _tool("import_gensim_artifacts.py"),
                     "--src", ref_dir, "--dest",
                     os.path.join(wd, "imported_artifacts")], cwd=REPO) == 0

    def pyinstaller_build(wd):
        return _run(["sh", os.path.join(REPO, "packaging", "build.sh")],
                    cwd=REPO) == 0

    def test_suite(wd):
        env = {**os.environ, "PYTHONPATH": _pythonpath(),
               "AIIS_MODEL_DIR": os.path.join(wd, "wd-eva02-v3"),
               "AIIS_CCIP_MODEL_DIR": os.path.join(wd, "ccip")}
        return _run([sys.executable, "-m", "pytest", "tests/", "-x", "-q"],
                    cwd=REPO, env=env) == 0

    return [
        Step("fetch-tagger", "download the WD-EVA02 tagger snapshot",
             needs_modules=["huggingface_hub"], run=fetch_tagger),
        Step("convert-tagger", "convert timm checkpoint -> --model-dir",
             scripts=["tools/convert_checkpoint.py"], run=convert_tagger),
        Step("tagger-parity", "per-layer parity vs the timm oracle",
             needs_modules=["timm"], scripts=["tools/parity_harness.py"],
             run=tagger_parity),
        Step("quant-report", "int8-vs-bf16 tag-set flip gate",
             scripts=["tools/quant_report.py"], run=quant_report),
        Step("fetch-ccip", "download ccip_onnx feat/metrics/json",
             needs_modules=["huggingface_hub"], run=fetch_ccip),
        Step("convert-ccip", "convert + metric-graph verdict",
             scripts=["tools/convert_ccip.py"], run=convert_ccip),
        Step("reference-run", "golden fixtures from a real reference run",
             run=reference_run),
        Step("gensim-import", "import the reference's gensim artifacts",
             needs_modules=["gensim"],
             scripts=["tools/import_gensim_artifacts.py"], run=gensim_import),
        Step("pyinstaller-build", "single-binary packaging",
             needs_modules=["PyInstaller"], scripts=["packaging/build.sh"],
             run=pyinstaller_build),
        Step("test-suite", "full suite against the converted real weights",
             run=test_suite),
    ]


REFERENCE_RUN_INSTRUCTIONS = """\
To record the reference fixtures (in the reference's own environment):
    git clone https://github.com/ryogrid/anime-illust-image-searcher ref
    cd ref && pip install -r requirements.txt
    python tagging.py --dir <fixed_corpus_dir>
    python genmodel.py
    mkdir -p {ref_dir} && cp tags-wd-tagger.txt doc2vec_* bm25_* {ref_dir}/
Then re-run this checklist (or set AIIS_REFERENCE_RUN_DIR).
"""


REHEARSAL_GAPS_HEADER = """\
# Offline release rehearsal — remaining gaps vs a networked release machine

This run drove the convert -> validate -> consume chain end-to-end against
STAGED synthetic repos (tools/stage_synthetic_release.py). Everything below is
what a real release machine would still exercise differently:
"""


def run_offline_rehearsal(workdir: str) -> int:
    """Drive the release chain end-to-end OFFLINE against staged synthetic
    repos shaped like the real HF downloads (VERDICT r4 #5): stage ->
    convert-tagger -> quant-report -> convert-ccip (incl. the metric-graph
    verdict) -> load both checkpoints through the predictors the CLIs use.
    Network-only steps are recorded in <workdir>/rehearsal_gaps.md instead of
    silently skipped."""
    os.makedirs(workdir, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    try:
        import stage_synthetic_release as stager
    finally:
        sys.path.pop(0)

    env = {**os.environ, "PYTHONPATH": _pythonpath()}
    # Force CPU unconditionally: the rehearsal's models are tiny, and a host
    # whose inherited JAX_PLATFORMS points at a down/slow accelerator relay
    # would otherwise hang the conversion subprocesses on backend init.
    env["JAX_PLATFORMS"] = "cpu"
    gaps = []

    print("== stage: synthetic HF-shaped repos")
    staged = stager.stage(os.path.join(workdir, "staged"))
    gaps.append("fetch-tagger / fetch-ccip: the real snapshot_download / "
                "hf_hub_download calls never ran (zero egress); staged "
                "synthetic repos stand in. models/hub.py's download plumbing "
                "is covered by tests/test_hub.py with a fake hub.")

    print("== convert-tagger (real converter, staged snapshot)")
    tagger_dest = os.path.join(workdir, "wd-eva02-v3")
    if _run([sys.executable, _tool("convert_checkpoint.py"),
             "--src", staged["tagger"], "--dest", tagger_dest],
            cwd=REPO, env=env) != 0:
        return 1
    gaps.append("convert-tagger ran on a 384-d/2-block staged geometry; the "
                "real checkpoint is 1024-d/24-block (same code path — "
                "autodetection from shapes — but real-shape conversion time/"
                "memory unmeasured).")

    print("== tagger-parity (timm oracle)")
    img = os.path.join(workdir, "parity_probe.png")
    if not os.path.exists(img):
        import numpy as np
        from PIL import Image

        rng = np.random.RandomState(0)
        Image.fromarray(rng.randint(0, 255, (600, 450, 3), np.uint8)).save(img)
    _run([sys.executable, _tool("parity_harness.py"),
          "--model-dir", tagger_dest, "--image", img], cwd=REPO, env=env)
    gaps.append("tagger-parity vs the REAL timm oracle needs network + timm "
                "(absent here; the harness prints SKIP). The math is covered "
                "offline by the vendored-oracle tests "
                "(tests/test_eva02_oracle.py, incl. full production "
                "geometry), but the published weights have never flowed "
                "through it.")

    print("== quant-report (int8 gate on the converted dir)")
    if _run([sys.executable, _tool("quant_report.py"),
             "--model-dir", tagger_dest], cwd=REPO, env=env) != 0:
        return 1
    gaps.append("quant-report measured random staged weights — an arithmetic "
                "characterization only; the int8 ship/no-ship gate needs the "
                "real weights' logit margins.")

    print("== convert-ccip (real converter + metric-graph verdict)")
    ccip_dest = os.path.join(workdir, "ccip")
    if _run([sys.executable, _tool("convert_ccip.py"),
             "--feat", os.path.join(staged["ccip"], "model_feat.onnx"),
             "--metrics", os.path.join(staged["ccip"], "model_metrics.onnx"),
             "--metrics-json", os.path.join(staged["ccip"], "metrics.json"),
             "--dest", ccip_dest], cwd=REPO, env=env) != 0:
        return 1
    gaps.append("convert-ccip's numpy-interpreter forward self-check needs a "
                "complete executable ONNX node program; the staged graph is "
                "the structural export mimic, so the check reported itself "
                "skipped here (conversion equivalence is covered offline by "
                "tests/test_ccip_convert.py's torch-oracle comparisons).")
    gaps.append("convert-ccip's metric verdict ran on a synthetic 1-cosine "
                "graph; whether the PUBLISHED model_metrics.onnx is 1-cosine "
                "(vs a learned metric the converter would ship) is still an "
                "open empirical question for the release machine.")

    print("== consume: load both converted checkpoints through the "
          "predictors the CLIs use")
    probe = (
        "import numpy as np\n"
        "from anime_illust_image_searcher_tpu.models.tagger import TaggerPredictor\n"
        "from anime_illust_image_searcher_tpu.models.ccip import CCIPPredictor\n"
        f"p = TaggerPredictor(model_dir={tagger_dest!r})\n"
        "p.load_model()\n"
        "s = p.model_cfg.img_size\n"
        "lines = p.predict(np.zeros((2, s, s, 3), np.uint8), 0.3, True, 0.3, True)\n"
        "assert len(lines) == 2\n"
        f"c = CCIPPredictor(model_dir={ccip_dest!r})\n"
        "c.load_model()\n"
        "sc = c.model_cfg.img_size\n"
        "f = c.ccip_batch_extract_features(np.zeros((2, sc, sc, 3), np.uint8))\n"
        "assert f.shape == (2, c.model_cfg.feature_dim)\n"
        "assert abs(c.ccip_default_threshold() - 0.17847511429108218) < 1e-12\n"
        "print('converted checkpoints load and run through the CLI predictors')\n"
    )
    if _run([sys.executable, "-c", probe], cwd=REPO, env=env) != 0:
        return 1
    gaps.append("test-suite: the rehearsal drove the predictor consumption "
                "path; the release machine runs the FULL suite with "
                "AIIS_MODEL_DIR/AIIS_CCIP_MODEL_DIR pointing at the real "
                "converted checkpoints, then regenerates golden fixtures "
                "from a reference run (reference-run/gensim-import steps — "
                "need the reference's torch/gensim environment) and builds "
                "the Windows binaries (pyinstaller-build).")

    gaps_path = os.path.join(workdir, "rehearsal_gaps.md")
    with open(gaps_path, "w", encoding="utf-8") as f:
        f.write(REHEARSAL_GAPS_HEADER)
        for g in gaps:
            f.write(f"\n- {g}\n")
    print(f"offline rehearsal complete; gap list: {gaps_path}")
    return 0


def main(argv) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/aiis_release")
    parser.add_argument("--check-wiring", action="store_true",
                        help="in-env smoke mode: verify every step's entry "
                             "point exists/imports/parses; no network needed")
    parser.add_argument("--offline-rehearsal", action="store_true",
                        help="drive the whole convert->validate->consume "
                             "chain offline against staged synthetic repos "
                             "(tools/stage_synthetic_release.py) and write "
                             "the remaining-gaps list")
    parser.add_argument("--from", dest="from_step", default=None,
                        help="resume from this step name")
    parser.add_argument("--only", default=None, help="run a single step")
    args = parser.parse_args(argv)

    if args.offline_rehearsal:
        return run_offline_rehearsal(args.workdir)

    steps = build_steps()

    if args.check_wiring:
        bad = 0
        for s in steps:
            problems = s.check_wiring()
            missing = s.missing_modules()
            status = "WIRED"
            detail = ""
            if problems:
                status, bad = "BROKEN", bad + 1
                detail = "; ".join(problems)
            elif missing:
                detail = f"(needs on release machine: {', '.join(missing)})"
            print(f"  {s.name:<18} {status} {detail}")
        print("wiring:", "FAIL" if bad else "OK")
        return 1 if bad else 0

    os.makedirs(args.workdir, exist_ok=True)
    state_path = os.path.join(args.workdir, "release_state.json")
    state = json.load(open(state_path)) if os.path.exists(state_path) else {}

    # A filter that selects zero steps (unknown/mistyped step name, or
    # contradictory --only/--from) would run nothing and still print the
    # success banner — refuse it up front instead.
    step_names = {s.name for s in steps}
    for flag, value in (("--only", args.only), ("--from", args.from_step)):
        if value and value not in step_names:
            print(f"{flag} {value}: unknown step "
                  f"(steps: {', '.join(s.name for s in steps)})")
            return 2
    if args.only and args.from_step and args.only != args.from_step:
        print(f"--only {args.only} conflicts with --from {args.from_step}: "
              "pass one or the other")
        return 2
    started = args.from_step is None or args.only is not None
    for s in steps:
        if args.only and s.name != args.only:
            continue
        if not started:
            if s.name == args.from_step:
                started = True
            else:
                continue
        if state.get(s.name) == "ok" and not args.only:
            print(f"== {s.name}: already ok, skipping")
            continue
        missing = s.missing_modules()
        if missing:
            print(f"== {s.name}: BLOCKED — install {', '.join(missing)}")
            state[s.name] = f"blocked: {missing}"
            json.dump(state, open(state_path, "w"), indent=1)
            return 1
        print(f"== {s.name}: {s.description}")
        t0 = time.time()
        ok = s.run(args.workdir)
        state[s.name] = "ok" if ok else "failed"
        json.dump(state, open(state_path, "w"), indent=1)
        print(f"== {s.name}: {'OK' if ok else 'FAILED'} ({time.time() - t0:.0f}s)")
        if not ok:
            return 1
    print("release checklist complete")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
