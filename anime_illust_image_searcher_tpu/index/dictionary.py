"""Token <-> id dictionary.

Replaces ``gensim.corpora.Dictionary`` (reference: genmodel.py:151) with a plain,
pickle-stable mapping. Id assignment follows gensim's semantics so corpora built by
both systems agree: for each document in order, tokens not yet in the dictionary are
assigned consecutive ids in *sorted token order within that document* (that is what
``Dictionary.doc2bow(..., allow_update=True)`` does).

The artifact file keeps the reference name ``doc2vec_dictionary`` and is written with
``pickle`` (genmodel.py:155-156), holding this class.
"""

from __future__ import annotations

import pickle
from typing import Dict, Iterable, List, Sequence, Tuple


class TagDictionary:
    def __init__(self, documents: Iterable[Sequence[str]] = ()) -> None:
        self.token2id: Dict[str, int] = {}
        self.id2token: List[str] = []
        self.dfs: Dict[int, int] = {}  # document frequency per term id
        self.num_docs: int = 0
        self.add_documents(documents)

    def add_documents(self, documents: Iterable[Sequence[str]]) -> None:
        for doc in documents:
            self.doc2bow(doc, allow_update=True)

    def doc2bow(self, document: Sequence[str], allow_update: bool = False) -> List[Tuple[int, int]]:
        counts: Dict[str, int] = {}
        for tok in document:
            counts[tok] = counts.get(tok, 0) + 1
        if allow_update:
            missing = sorted(t for t in counts if t not in self.token2id)
            for tok in missing:
                self.token2id[tok] = len(self.token2id)
                self.id2token.append(tok)
            self.num_docs += 1
        bow = sorted(
            (self.token2id[tok], cnt) for tok, cnt in counts.items() if tok in self.token2id
        )
        if allow_update:
            for term_id, _ in bow:
                self.dfs[term_id] = self.dfs.get(term_id, 0) + 1
        return bow

    def __len__(self) -> int:
        return len(self.token2id)

    def __contains__(self, token: str) -> bool:
        return token in self.token2id

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(path: str) -> "TagDictionary":
        with open(path, "rb") as f:
            obj = pickle.load(f)
        if not isinstance(obj, TagDictionary):
            raise TypeError(f"{path} does not contain a TagDictionary")
        return obj
