#!/bin/sh
# Single-binary builds — analog of the reference's packaging.bat /
# packaging_webui_step{1,2}.bat (one step here; no streamlit post-processing).
# Requires: pip install pyinstaller  (not available in the zero-egress image;
# run on a networked build machine for the target OS).
set -e
cd "$(dirname "$0")"
pyinstaller --noconfirm aiis_cmd_run.spec
pyinstaller --noconfirm aiis_webui.spec
echo "binaries in packaging/dist/: aiis_cmd_run, aiis_webui"
