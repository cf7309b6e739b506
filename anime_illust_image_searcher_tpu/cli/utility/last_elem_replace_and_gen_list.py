r"""Tag-file repair tool (reference: utility/last_elem_replace_and_gen_list.py).

Fixes the historical tagger bug where the last tag of a line carried a stray ``\`` and
a character tag was concatenated onto it: splits trailing character-tag suffixes back
into their own column, dedups lines by file path, writes ``*_replaced.csv`` plus a
character-tag cheat sheet ``*_tag_chet_sheet.csv`` (reference spelling).

Character tags come from a local ``selected_tags.csv`` (``--labels``); the reference
downloads it from the HF Hub, which a zero-egress deployment cannot.
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict, List

from ...models.weights import LabelSet


def sort_and_uniq(tags: List[str]) -> List[str]:
    return sorted(set(tags))


class Replacer:
    def __init__(self, labels: LabelSet) -> None:
        self.labels = labels

    def replace_and_etc(self, file_path: str) -> None:
        out_path = file_path.split(".")[0] + "_replaced.csv"
        cheet_sheet_fpath = file_path.split(".")[0] + "_tag_chet_sheet.csv"

        tagged_info_list: List[List[str]] = []
        with open(file_path, "r", encoding="utf-8") as f:
            for line in f:
                row = line.strip().split(",")
                row[-1] = row[-1].replace("\\", "")
                tagged_info_list.append(row)

        last_elems = sort_and_uniq([x[-1].replace("\\", "") for x in tagged_info_list])

        character_tags = [self.labels.names[i] for i in self.labels.character_index]
        character_res: Dict[str, str] = {}
        for elem in last_elems:
            for tag in character_tags:
                if elem.endswith(tag):
                    if len(elem) > len(tag):
                        character_res[elem] = elem.replace(tag, "," + tag)
                    else:
                        character_res[elem] = tag
                    break

        deduplicate: Dict[str, bool] = {}
        with open(out_path, "w", encoding="utf-8") as out:
            for tags in tagged_info_list:
                if tags[-1] in character_res:
                    tags[-1] = character_res[tags[-1]]
                if tags[0] in deduplicate:
                    continue
                deduplicate[tags[0]] = True
                out.write(",".join(tags) + "\n")

        contained = list(character_res.values())
        tmp: List[str] = []
        for value in contained:
            splited = value.split(",")
            tmp.append(splited[1] if len(splited) > 1 else value)
        with open(cheet_sheet_fpath, "w", encoding="utf-8") as f:
            for tag in sort_and_uniq(tmp):
                f.write(tag + "\n")


def main(arg_str: List[str]) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--csv", nargs=1, required=True, help="replace target csv file path")
    parser.add_argument("--labels", default=None,
                        help="local selected_tags.csv path (tag_id,name,category)")
    args = parser.parse_args(arg_str)
    if args.labels:
        labels = LabelSet.from_csv(args.labels)
    else:
        print("WARNING: no --labels given; using synthetic label set")
        labels = LabelSet.synthetic(10861)
    Replacer(labels).replace_and_etc(args.csv[0])


if __name__ == "__main__":
    main(sys.argv[1:])
