"""Convert ASCII rainfall rasters (ESRI ASCII grid) to the PETSc-binary
raster format the forcing subsystem reads.

The reference ships MATLAB scripts for this
(tools/preprocessing/spatially-distributed-rainfall/); this is the Python
equivalent producing the same layout: one Vec per file with header
[ncols, nrows, xlc, ylc, cellsize] followed by row-major values
(rdyforcing_dataset.c:118-145).

Usage:
  python tools/convert_rainfall.py input.asc output.int32.bin
  python tools/convert_rainfall.py --batch dir_in dir_out  # *.asc -> *.bin
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdycore_tpu.io.petsc_binary import write_petsc_vec  # noqa: E402


def read_esri_ascii(path: str):
    """Minimal ESRI ASCII grid reader."""
    header = {}
    data_start = 0
    with open(path) as f:
        lines = f.readlines()
    for i, line in enumerate(lines):
        parts = line.split()
        if len(parts) == 2 and parts[0].lower() in (
            "ncols", "nrows", "xllcorner", "yllcorner", "cellsize",
            "nodata_value",
        ):
            header[parts[0].lower()] = float(parts[1])
            data_start = i + 1
        else:
            break
    values = np.loadtxt(lines[data_start:])
    nrows = int(header["nrows"])
    ncols = int(header["ncols"])
    values = values.reshape(nrows, ncols)
    # ASCII grids store north-up; the raster dataset indexes from the
    # lower-left corner, so flip to south-up row-major
    values = values[::-1]
    nodata = header.get("nodata_value")
    if nodata is not None:
        values = np.where(values == nodata, 0.0, values)
    return header, values


def convert(in_path: str, out_path: str):
    header, values = read_esri_ascii(in_path)
    cellsize = header["cellsize"]
    # header stores CELL-CENTER coordinates of the lower-left cell
    xlc = header["xllcorner"] + cellsize / 2.0
    ylc = header["yllcorner"] + cellsize / 2.0
    out = np.concatenate(
        [
            [header["ncols"], header["nrows"], xlc, ylc, cellsize],
            values.ravel(),
        ]
    )
    write_petsc_vec(out_path, out)
    print(f"{in_path} -> {out_path} ({int(header['ncols'])}x{int(header['nrows'])})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--batch", action="store_true")
    args = ap.parse_args()
    if args.batch:
        os.makedirs(args.output, exist_ok=True)
        for name in sorted(os.listdir(args.input)):
            if name.endswith(".asc"):
                convert(
                    os.path.join(args.input, name),
                    os.path.join(args.output, name[:-4] + ".int32.bin"),
                )
    else:
        convert(args.input, args.output)


if __name__ == "__main__":
    main()
