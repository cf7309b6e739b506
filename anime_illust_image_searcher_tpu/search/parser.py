r"""Query parsing: ``TAG:WEIGHT`` / ``TAG:+N`` (require) / ``TAG:-N`` (exclude) syntax.

The reference parses the query twice with subtly different rules, and both are
preserved verbatim (QUIRKS.md #9, #11, #12):

  - the Doc2Vec side (webui.py:82-99) normalizes parens to the escaped form
    ``\(``/``\)`` and keeps every weight (including negatives) in the normalizer sum;
  - the BM25 side (webui.py:354-371) uses raw tag text for dictionary lookup (KeyError
    on unknown tags is user-facing behavior), maps ``+N`` to MAGIC+N and appends the
    tag to ``required_tags``, and maps both ``-N`` *and plain numeric* weights into the
    branch that appends to ``exclude_tags``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

from ..index.dictionary import TagDictionary

REQUIRE_TAG_MAGIC_NUMBER = 1000  # webui.py:60


def _has_weight_suffix(parts: List[str]) -> bool:
    last = parts[-1]
    return len(parts) >= 2 and (
        last.startswith("+") or last.startswith("-") or last.isdigit()
    )


def parse_doc2vec_query(new_doc: str) -> Tuple[List[Tuple[str, int]], int]:
    """Return ([(escaped_tag, weight)], all_weight) — webui.py:82-101 semantics."""
    tags = new_doc.split(" ")
    tag_and_weight_list: List[Tuple[str, int]] = []
    all_weight = 0
    for tag in tags:
        parts = tag.split(":")
        if _has_weight_suffix(parts):
            tag_elem = ":".join(parts[:-1]).replace("\\(", "(").replace("\\)", ")")
            weight = int(parts[-1])
        else:
            tag_elem = ":".join(parts).replace("\\(", "(").replace("\\)", ")")
            weight = 1
        escaped = tag_elem.replace("(", "\\(").replace(")", "\\)")
        tag_and_weight_list.append((escaped, weight))
        all_weight += weight
    if all_weight == 0:
        all_weight = 1
    return tag_and_weight_list, all_weight


@dataclass
class BM25Query:
    term_weights: Dict[int, float] = field(default_factory=dict)
    required_tags: List[str] = field(default_factory=list)
    exclude_tags: List[str] = field(default_factory=list)


def parse_bm25_query(
    new_doc: str, dictionary: TagDictionary, magic: int = REQUIRE_TAG_MAGIC_NUMBER
) -> BM25Query:
    """webui.py:354-371 semantics, including the KeyError on unknown tags and the
    plain-numeric-weight → exclude_tags quirk (QUIRKS.md #7, #11).

    ``magic`` must be the same sentinel the scorer decodes with
    (SearchConfig.require_tag_magic_number) — the engine passes its config value."""
    q = BM25Query()
    for term in new_doc.split(" "):
        parts = term.split(":")
        if _has_weight_suffix(parts):
            if parts[-1].startswith("+"):
                tag = ":".join(parts[:-1])
                q.term_weights[dictionary.token2id[tag]] = (
                    magic + int(parts[-1])
                )
                q.required_tags.append(tag)
            else:
                tag = ":".join(parts[:-1])
                q.term_weights[dictionary.token2id[tag]] = int(parts[-1])
                q.exclude_tags.append(tag)
        else:
            q.term_weights[dictionary.token2id[":".join(parts)]] = 1
    return q
