"""Compact traceback reporting.

The reference duplicates a ``print_traceback`` helper in five scripts
(tagging.py:68-78, gen_cfeatures.py:55-65, ...); here it lives once.
"""

from __future__ import annotations

import re
import sys
import traceback
from typing import List


def print_traceback() -> None:
    """Print the current exception's stack, one squashed line per frame."""
    tb = traceback.extract_tb(sys.exc_info()[2])
    trace: List[str] = traceback.format_list(tb)
    print("---- traceback ----")
    for line in trace:
        if "~^~" in line:
            print(line.rstrip())
        else:
            print(re.sub(r"\n\s*", " ", line.rstrip()))
    print("-------------------")


def format_error(e: BaseException) -> str:
    """'<class>: <description>' string used by per-image skip handlers
    (reference: tagging.py:248-251)."""
    return "%s: %s" % (type(e), str(e))
