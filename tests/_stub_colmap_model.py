"""Helper for test_preprocess_iphone: the stub colmap's model_converter stage
writes a minimal text model (one OPENCV camera, every png in ../../images
registered with identity rotation at spread-out positions)."""

import glob
import os
import sys

out = sys.argv[1]
os.makedirs(out, exist_ok=True)
# work_dir layout is <out>/colmap/text; images live at <out>/images.
image_dir = os.path.normpath(os.path.join(out, "..", "..", "images"))
names = sorted(os.path.basename(p) for p in glob.glob(f"{image_dir}/*.png"))

with open(os.path.join(out, "cameras.txt"), "w") as f:
    f.write("1 OPENCV 32 32 40.0 40.0 16.0 16.0 0.0 0.0 0.0 0.0\n")
with open(os.path.join(out, "images.txt"), "w") as f:
    for i, name in enumerate(names):
        f.write(f"{i+1} 1 0 0 0 {-float(i)} 0.0 -2.0 1 {name}\n\n")
