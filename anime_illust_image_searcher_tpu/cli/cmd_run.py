"""Single-binary command dispatcher (reference: cmd_run.py:7-25).

    python -m anime_illust_image_searcher_tpu.cli.cmd_run tagging --dir D
    python -m anime_illust_image_searcher_tpu.cli.cmd_run genmodel [--update]
    python -m anime_illust_image_searcher_tpu.cli.cmd_run gen_cfeatures --dir D
    python -m anime_illust_image_searcher_tpu.cli.cmd_run webui [--rep A B]
"""

from __future__ import annotations

import sys


def main() -> None:
    if len(sys.argv) < 2:
        print("usage: cmd_run tagging|genmodel|gen_cfeatures|webui ...")
        sys.exit(1)
    command = sys.argv[1]
    rest = sys.argv[2:]
    if command == "tagging":
        from . import tagging

        tagging.main(rest)
    elif command == "genmodel":
        from . import genmodel

        genmodel.main(rest)
    elif command == "gen_cfeatures":
        from . import gen_cfeatures

        gen_cfeatures.main(rest)
    elif command == "webui":
        from . import webui

        webui.main(rest)
    else:
        print("Invalid command")
        sys.exit(1)


if __name__ == "__main__":
    main()
