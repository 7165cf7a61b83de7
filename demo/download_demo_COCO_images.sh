#!/bin/bash -e
# Fetch the 8 COCO example images the reference demo uses, into
# datasets/coco_examples (run from the repo root).
mkdir -p datasets/coco_examples
cd datasets/coco_examples
for id in 3045175664_6e42bd43f3 6140190660_c220e6e1ea 5375406975_0a72911ae7 \
          4634546881_8203dd8f94 4586421859_517c65c02b 4198075011_06332047e2 \
          3480322600_bc542ae19b 3164116912_41b30edbf7; do
  wget "https://farm1.staticflickr.com/19/${id}_z.jpg"
done
