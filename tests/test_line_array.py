"""LazyLineArray must be element-for-element identical to the eager loop
(`for line in f: out.append(line.strip())`) the engine used to run at load
(reference: webui.py:633-640)."""

import os

import numpy as np
import pytest

from anime_illust_image_searcher_tpu.utils.line_array import (
    LazyLineArray, load_line_array,
)


def eager(path):
    out = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            out.append(line.strip())
    return out


def write(tmp_path, data: bytes):
    p = os.path.join(tmp_path, "f.csv")
    with open(p, "wb") as f:
        f.write(data)
    return p


CASES = [
    b"",                                   # empty file
    b"\n",                                 # single blank line
    b"a,b,c\n",                            # trailing newline
    b"a,b,c",                              # no trailing newline
    b"a\n\nb\n",                           # interior blank line
    b"a\r\nb\r\n",                         # CRLF (strip removes the \r)
    b"  padded  \nx\ty\n",                 # spaces/tabs stripped
    "/img/　lead.png,tag\n".encode(),  # U+3000 ideographic space strips
    b"a\nb",                               # partial final line
    "café,タグ\n".encode(),   # non-ASCII content
    b"\n\n\n",                             # only blank lines
]


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_matches_eager_loop(tmp_path, data):
    p = write(tmp_path, data)
    arr = load_line_array(p)
    ref = eager(p)
    assert len(arr) == len(ref)
    assert list(arr) == ref
    assert [arr[i] for i in range(len(arr))] == ref
    if ref:
        assert arr[-1] == ref[-1]  # negative indexing


def test_lone_cr_falls_back_to_eager(tmp_path):
    # classic-Mac lone-\r terminators: text mode splits them, a \n byte scan
    # can't — load_line_array must return the eager list for parity
    p = write(tmp_path, b"a\rb\nc\n")
    arr = load_line_array(p)
    assert not isinstance(arr, LazyLineArray)
    assert list(arr) == eager(p) == ["a", "b", "c"]


def test_trailing_lone_cr_falls_back(tmp_path):
    p = write(tmp_path, b"a\nb\r")
    arr = load_line_array(p)
    assert not isinstance(arr, LazyLineArray)
    assert list(arr) == eager(p)


def test_crlf_stays_lazy(tmp_path):
    p = write(tmp_path, b"a\r\nb\r\n")
    arr = load_line_array(p)
    assert isinstance(arr, LazyLineArray)
    assert list(arr) == eager(p) == ["a", "b"]


def test_invalid_utf8_raises_at_load(tmp_path):
    # the eager loop raised UnicodeDecodeError at engine START; laziness must
    # not defer that to first query
    p = write(tmp_path, b"ok,line\n\xff\xfe broken\n")
    with pytest.raises(UnicodeDecodeError):
        load_line_array(p)


def test_multibyte_across_validation_chunks(tmp_path):
    # a multi-byte sequence straddling the incremental-validation chunk edge
    # must not raise
    payload = ("x" * ((1 << 24) - 1) + "é").encode() + b"\nrest\n"
    p = write(tmp_path, payload)
    arr = load_line_array(p)
    assert arr[1] == "rest"


def test_index_errors_and_slices(tmp_path):
    p = write(tmp_path, b"a\nb\nc\n")
    arr = load_line_array(p)
    with pytest.raises(IndexError):
        arr[3]
    with pytest.raises(IndexError):
        arr[-4]
    assert arr[0:2] == ["a", "b"]
    assert arr[::-1] == ["c", "b", "a"]


def test_random_blob_parity(tmp_path):
    rng = np.random.RandomState(0)
    rows = []
    for i in range(500):
        tags = [f"t{rng.randint(40)}" for _ in range(rng.randint(1, 8))]
        rows.append(f"/d/{i:04d}.png," + ",".join(tags))
        if rng.rand() < 0.05:
            rows.append("")  # interior blank
    data = ("\n".join(rows) + ("\n" if rng.rand() < 0.5 else "")).encode()
    p = write(tmp_path, data)
    arr = load_line_array(p)
    assert list(arr) == eager(p)
