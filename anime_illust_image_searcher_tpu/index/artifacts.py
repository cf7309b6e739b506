"""On-disk artifact names and backup/versioning helpers.

The artifact chain is the real API between pipeline stages (SURVEY.md §1). File names —
including the reference's misspellings (``charactor-featues-idx``) — are preserved
verbatim because they are the on-disk contract users already have
(reference: genmodel.py:84-97,155-175; gen_cfeatures.py:311,376; tagging.py:293).
"""

from __future__ import annotations

import os
import re
import shutil
from typing import List, Optional

TAGS_FILE = "tags-wd-tagger.txt"
TAGS_BAK_FILE = "tags-wd-tagger.txt.bak"
DOC2VEC_IDX_CSV = "tags-wd-tagger_doc2vec_idx.csv"
DOC2VEC_IDX_CSV_BAK = "tags-wd-tagger_doc2vec_idx.csv.bak"
DOC2VEC_MODEL = "doc2vec_model"
DOC2VEC_INDEX = "doc2vec_index"
DOC2VEC_DICTIONARY = "doc2vec_dictionary"
BM25_CORPUS = "bm25_corpus"
BM25_IDF = "bm25_idf"
BM25_AVGDL = "bm25_avgdl"
BM25_D = "bm25_D"
BM25_DOC_LENGTHS = "bm25_doc_lengths"
# TPU-era sidecar (not a reference artifact): mmap-able device-form arrays
# derived from the five BM25 pickles, keyed by their fingerprint — cuts 1M-doc
# engine cold start by ~170 s (ARCHITECTURE §3).
BM25_SERVE_CACHE = "bm25_servecache"
# Reference spelling preserved (gen_cfeatures.py:311).
CFEATURES_INDEX_PREFIX = "charactor-featues-idx"
CFEATURES_CSV = "charactor-featues-idx.csv"

_CFEATURES_REV_PATTERN = re.compile(r"^charactor-featues-idx(\d*)$")


def backup_file(path: str, bak_path: Optional[str] = None) -> None:
    """Copy ``path`` to ``path + '.bak'`` (reference: tagging.py:284-291)."""
    bak_path = bak_path or path + ".bak"
    with open(path, "r", encoding="utf-8") as f:
        with open(bak_path, "w", encoding="utf-8") as f_bak:
            f_bak.write(f.read())


def count_non_empty_lines(path: str) -> int:
    """Count non-empty lines (reference: genmodel.py:101-107)."""
    count = 0
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            if line.strip():
                count += 1
    return count


def cfeatures_index_name(revision: int) -> str:
    """Name of the cfeature index at a revision: rev 0 has no numeric suffix
    (reference: gen_cfeatures.py:359-366)."""
    return CFEATURES_INDEX_PREFIX + (str(revision) if revision else "")


def get_current_cfeature_number(directory: str = ".") -> int:
    """Max revision N among ``charactor-featues-idx{N}`` files
    (reference: gen_cfeatures.py:317-335)."""
    numbers: List[int] = []
    for name in os.listdir(directory):
        m = _CFEATURES_REV_PATTERN.match(name)
        if m:
            numbers.append(int(m.group(1)) if m.group(1) else 0)
    # default 0 so a CSV-without-index state (interrupted gen_cfeatures run) surfaces
    # as a clean missing-index error downstream instead of ValueError here
    return max(numbers, default=0)


def backup_cfeature_indexes(backup_dir: str, directory: str = ".") -> List[str]:
    """Copy every ``charactor-featues-idx*`` file into ``backup_dir``
    (reference: gen_cfeatures.py:346-352)."""
    os.makedirs(backup_dir, exist_ok=True)
    copied: List[str] = []
    for name in sorted(os.listdir(directory)):
        if name.startswith(CFEATURES_INDEX_PREFIX):
            src = os.path.join(directory, name)
            if os.path.isfile(src):
                shutil.copy2(src, os.path.join(backup_dir, name))
                copied.append(name)
    return copied
