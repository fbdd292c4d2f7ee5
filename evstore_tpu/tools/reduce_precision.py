"""Offline precision reduction of exported EV tables.

Reference: script/reduce_precision.py converts fp32 EV CSVs to 16/8/4posit
variants, emitting both the binary-source form (for the C++ engine) and a
float CSV (for accuracy testing).  Here the input/output is the binary
EV-table format (cache/storage.py); the codecs are ops/quant.py.

CLI:
  python -m evstore_tpu.tools.reduce_precision --in-dir ev32/ --out-dir ev8/ \
      --table-sizes 100-200-... --dim 36 --new-precision 8
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Sequence

import numpy as np

from evstore_tpu.cache.storage import (_decode_rows, encode_rows, row_nbytes,
                                       write_ev_tables_binary)


def reduce_tables(in_dir: str, out_dir: str, table_sizes: Sequence[int],
                  dim: int, new_precision: int, in_precision: int = 32,
                  also_float_check: bool = False) -> List[str]:
    os.makedirs(out_dir, exist_ok=True)
    tables = []
    nb = row_nbytes(in_precision, dim)
    for t, n in enumerate(table_sizes):
        raw = np.fromfile(os.path.join(in_dir, f"ev-table-{t + 1}.bin"),
                          dtype=np.uint8).reshape(n, nb)
        tables.append(_decode_rows(raw, in_precision, dim))
    paths = write_ev_tables_binary(tables, out_dir, new_precision)
    if also_float_check:
        # the reference's "float CSV for accuracy testing": decoded values
        for t, n in enumerate(table_sizes):
            nb2 = row_nbytes(new_precision, dim)
            raw = np.fromfile(paths[t], dtype=np.uint8).reshape(n, nb2)
            dec = _decode_rows(raw, new_precision, dim)
            np.savetxt(os.path.join(out_dir, f"ev-table-{t + 1}-float.csv"),
                       dec, delimiter=",")
    return paths


def apply_preconditioning_add_x(in_dir: str, out_dir: str,
                                table_sizes: Sequence[int], dim: int,
                                x: float, precision: int = 32) -> List[str]:
    """EV preconditioning: shift values by +x before precision reduction
    (script/apply_ev_preconditioning.py:52)."""
    os.makedirs(out_dir, exist_ok=True)
    nb = row_nbytes(precision, dim)
    tables = []
    for t, n in enumerate(table_sizes):
        raw = np.fromfile(os.path.join(in_dir, f"ev-table-{t + 1}.bin"),
                          dtype=np.uint8).reshape(n, nb)
        tables.append(_decode_rows(raw, precision, dim) + np.float32(x))
    return write_ev_tables_binary(tables, out_dir, precision)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--in-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--table-sizes", required=True,
                   help="dash-separated row counts")
    p.add_argument("--dim", type=int, default=36)
    p.add_argument("--new-precision", type=int, required=True,
                   choices=[16, 8, 4])
    p.add_argument("--read-as", type=int, default=32)
    p.add_argument("--precondition-add", type=float, default=0.0)
    p.add_argument("--float-check", action="store_true")
    args = p.parse_args(argv)
    sizes = [int(x) for x in args.table_sizes.split("-")]
    in_dir = args.in_dir
    if args.precondition_add != 0.0:
        pre = os.path.join(args.out_dir, "_preconditioned")
        apply_preconditioning_add_x(in_dir, pre, sizes, args.dim,
                                    args.precondition_add, args.read_as)
        in_dir = pre
    paths = reduce_tables(in_dir, args.out_dir, sizes, args.dim,
                          args.new_precision, args.read_as, args.float_check)
    print("\n".join(paths))
    return 0


if __name__ == "__main__":
    sys.exit(main())
