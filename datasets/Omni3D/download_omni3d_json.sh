#!/bin/bash -e
# Fetch the processed Omni3D annotation jsons (same release the reference
# uses; see DATA.md).
cd "$(dirname "$0")"
wget https://dl.fbaipublicfiles.com/omni3d_data/Omni3D_json.zip
unzip Omni3D_json.zip
