"""anime-illust-image-searcher_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of
ryogrid/anime-illust-image-searcher.

A three-stage offline indexing pipeline plus an online search engine:

  1. ``cli.tagging``       — WD-EVA02-Large ViT multi-label tagger (Flax + Pallas
                             flash-attention), batched and pjit-sharded over a device
                             mesh (reference: tagging.py).
  2. ``cli.genmodel``      — Doc2Vec PV-DBOW training + BM25 index build, both as
                             jitted JAX programs (reference: genmodel.py).
  3. ``cli.gen_cfeatures`` — CCIP character-feature (caformer) embedding index
                             (reference: gen_cfeatures.py).
  4. ``cli.webui``         — search web UI + query engine: BM25 + Doc2Vec fusion with
                             TAG:WEIGHT / +require / -exclude syntax and two reranking
                             modes (reference: webui.py).

The package directory uses underscores for Python importability; the project name is
"anime-illust-image-searcher_tpu".
"""

__version__ = "0.1.0"
