"""Root shim: `python webui.py [--rep A B]` serves the search UI on port 8501.
Implementation: anime_illust_image_searcher_tpu/cli/webui.py."""
import sys

from anime_illust_image_searcher_tpu.cli.webui import main

if __name__ == "__main__":
    main(sys.argv[1:])
