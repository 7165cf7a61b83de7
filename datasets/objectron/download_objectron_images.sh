#!/bin/bash -e
# Fetch the pre-processed Objectron RGB images (~24 GB; see DATA.md).
cd "$(dirname "$0")"
wget https://dl.fbaipublicfiles.com/omni3d_data/objectron_images.zip
unzip objectron_images.zip
