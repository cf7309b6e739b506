"""Root shim: `python genmodel.py ...` matches the reference's CLI surface.
Implementation: anime_illust_image_searcher_tpu/cli/genmodel.py."""
import sys

from anime_illust_image_searcher_tpu.cli.genmodel import main

if __name__ == "__main__":
    main(sys.argv[1:])
