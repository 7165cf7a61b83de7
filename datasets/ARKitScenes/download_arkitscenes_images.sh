#!/bin/bash -e
# Fetch the pre-processed ARKitScenes RGB images (~28 GB; see DATA.md).
cd "$(dirname "$0")"
wget https://dl.fbaipublicfiles.com/omni3d_data/ARKitScenes_images.zip
unzip ARKitScenes_images.zip
