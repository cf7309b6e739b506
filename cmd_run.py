"""Root shim for the packaged-binary dispatcher (reference: cmd_run.py)."""
from anime_illust_image_searcher_tpu.cli.cmd_run import main

if __name__ == "__main__":
    main()
