"""The reference's ONE published real-output sample, wired in as a fixture
(VERDICT r3 #6; reference: tagging_example.txt:1-10, README.md:149-151).

``tests/fixtures/tagging_example.txt`` is a byte-exact copy of the sample. It
flows through every consumer of the tag-file format: the tagger's line
assembler (format round-trip), genmodel's reader + >=3-tag filter, counttag,
and both repair utilities — pinning that real reference output survives the
whole artifact chain unchanged.
"""

import os
import shutil

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tagging_example.txt")


@pytest.fixture
def example_lines():
    with open(FIXTURE, encoding="utf-8") as f:
        return f.read().splitlines()


@pytest.fixture
def tmp_cwd(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_fixture_shape(example_lines):
    """10 lines, Windows-style path + >=3 comma-separated tags each; tags carry
    no spaces (the tagger writes underscores, tagging.py:205-226) and no empty
    tokens (every sample line has general tags, so no QUIRKS-#17 leading comma)."""
    assert len(example_lines) == 10
    for line in example_lines:
        parts = line.split(",")
        path, tags = parts[0], parts[1:]
        assert "\\" in path and path.endswith(".png")
        assert len(tags) >= 3  # all 10 sample docs survive genmodel's filter
        for t in tags:
            assert t and " " not in t


def test_line_assembler_round_trips_sample_tags(example_lines):
    """Feeding each sample line's tag names (as general tags, in published order)
    back through the tagger's assembler reproduces the tag payload byte-exactly:
    the published format IS this framework's output format."""
    from anime_illust_image_searcher_tpu.models.tagger import TaggerPredictor

    for line in example_lines:
        tags = line.split(",")[1:]
        # descending synthetic probs preserve the published order through the
        # assembler's sort; character set empty -> no trailing block
        general = np.linspace(0.9, 0.5, num=len(tags)).astype(np.float32)
        fake = TaggerPredictor.__new__(TaggerPredictor)
        fake._general_names = [t.replace("_", " ") for t in tags]
        fake._character_names = []
        out = fake._assemble_line(general, 0.3, np.zeros(0, np.float32), 0.15)
        assert out == ",".join(tags)


def test_genmodel_reader_keeps_all_sample_docs(example_lines, tmp_cwd):
    """genmodel's >=3-tag filter keeps every sample doc and the idx csv is a
    byte-identical copy (reference: genmodel.py:21-43 on its own output)."""
    from anime_illust_image_searcher_tpu.cli.genmodel import (
        read_documents_and_gen_idx_text,
    )

    shutil.copy(FIXTURE, "tags-wd-tagger.txt")
    docs, kept = read_documents_and_gen_idx_text("tags-wd-tagger.txt")
    assert len(docs) == 10
    assert [d[0] for d in docs] == [l.split(",")[1] for l in example_lines]
    with open("tags-wd-tagger_doc2vec_idx.csv", encoding="utf-8") as f:
        assert f.read() == open(FIXTURE, encoding="utf-8").read()


def test_counttag_on_sample(tmp_cwd, capsys):
    """counttag's verbatim tags[1:-1] slice (drops path AND last tag,
    reference: utility/counttag.py:5-13) counts 28 unique tags on the sample."""
    from anime_illust_image_searcher_tpu.cli.utility import counttag

    shutil.copy(FIXTURE, "tags-wd-tagger.txt")
    counttag.main()
    assert "28 unique tags found" in capsys.readouterr().out


def test_repair_utilities_pass_sample_through_unchanged(example_lines, tmp_cwd):
    """The sample predates no tagger bug: with a label set whose character tags
    don't suffix-match any sample tag, last_elem_replace writes the lines back
    byte-identically (paths are unique, no stray backslashes) and the cheat
    sheet is empty; make_unique_taglist emits the sorted union of all tokens."""
    from anime_illust_image_searcher_tpu.cli.utility import (
        last_elem_replace_and_gen_list as repair,
        make_unique_taglist as uniq,
    )
    from anime_illust_image_searcher_tpu.models.weights import LabelSet

    shutil.copy(FIXTURE, "sample.csv")
    labels = LabelSet(
        names=["general_a", "zzz_character_tag"],
        rating_index=[], general_index=[0], character_index=[1],
    )
    repair.Replacer(labels).replace_and_etc("sample.csv")
    with open("sample_replaced.csv", encoding="utf-8") as f:
        assert f.read().splitlines() == example_lines
    with open("sample_tag_chet_sheet.csv", encoding="utf-8") as f:
        assert f.read() == ""

    uniq.Replacer(labels).replace_and_etc("sample.csv")
    # the unique-taglist tool only emits tokens that END WITH a known character
    # tag; none match, so the output is empty — same as the reference on a
    # bug-free file
    with open("sample_unique_tags.csv", encoding="utf-8") as f:
        assert f.read() == ""
