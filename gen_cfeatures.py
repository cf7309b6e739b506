"""Root shim: `python gen_cfeatures.py ...` matches the reference's CLI surface.
Implementation: anime_illust_image_searcher_tpu/cli/gen_cfeatures.py."""
import sys

from anime_illust_image_searcher_tpu.cli.gen_cfeatures import (  # noqa: F401
    Predictor, main,
)

if __name__ == "__main__":
    main(sys.argv[1:])
