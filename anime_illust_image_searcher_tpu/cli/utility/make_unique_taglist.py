"""Unique-tag cheat-sheet generator (reference: utility/make_unique_taglist.py).

Builds a sorted unique tag list from a tag file, splitting concatenated character-tag
suffixes (the historical tagger bug) into (prefix, character tag) pairs. Writes
``*_unique_tags.csv``.
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict, List

from ...models.weights import LabelSet


class Replacer:
    def __init__(self, labels: LabelSet) -> None:
        self.labels = labels

    def replace_and_etc(self, file_path: str) -> None:
        taggs_dict: Dict[str, bool] = {}
        with open(file_path, "r", encoding="utf-8") as f:
            for line in f:
                row = line.strip().split(",")
                row[-1] = row[-1].replace("\\", "")
                for tag in row:
                    taggs_dict[tag] = True

        all_tags: List[str] = list(taggs_dict.keys())
        conved: Dict[str, bool] = {}
        character_tags = [self.labels.names[i] for i in self.labels.character_index]
        for elem in all_tags:
            for tag in character_tags:
                if elem.endswith(tag):
                    conved[elem.replace(tag, "")] = True
                    conved[tag] = True
                    break

        result = sorted(conved.keys())
        out_path = file_path.split(".")[0] + "_unique_tags.csv"
        with open(out_path, "w", encoding="utf-8") as f:
            for tag in result:
                try:
                    f.write(tag + "\n")
                except Exception:  # noqa: BLE001 — skip unencodable, like reference
                    print(f"error: {tag}")
                    continue


def main(arg_str: List[str]) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--tags", nargs=1, required=True, help="analyze target tags file path")
    parser.add_argument("--labels", default=None,
                        help="local selected_tags.csv path (tag_id,name,category)")
    args = parser.parse_args(arg_str)
    if args.labels:
        labels = LabelSet.from_csv(args.labels)
    else:
        print("WARNING: no --labels given; using synthetic label set")
        labels = LabelSet.synthetic(10861)
    Replacer(labels).replace_and_etc(args.tags[0])


if __name__ == "__main__":
    main(sys.argv[1:])
