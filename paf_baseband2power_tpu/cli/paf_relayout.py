"""CLI: convert recordings between the wire and device (series-row) layouts.

``capture --device-layout`` rings and their spills hold blocks in the TPU
series-row form (``ORDER SERIES`` header) — the fast layout for every
detection mode, but a non-standard DADA ordering. This tool rewrites a
recording in the other layout so device-layout captures stay interoperable
with stock PSRDADA consumers (and wire archives can be promoted to the
fast layout for reprocessing): the byte-for-byte inverse of the capture
engine's corner turn, block by block.

Reference interop contract: the TFTFP wire order of ``capture.c:540-544``
(frame placement at ``(idf*48 + ifreq) * pkt_size``).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .. import constants as C


def wire_to_rows(block: np.ndarray, ndf: int, nchk: int) -> np.ndarray:
    b6 = block.reshape(ndf, nchk, C.NSAMP_DF, C.NCHAN_CHK, C.NPOL_SAMP, 2)
    return np.ascontiguousarray(
        b6.transpose(1, 3, 4, 0, 2, 5).reshape(
            nchk * C.NCHAN_CHK * C.NPOL_SAMP, -1))


def rows_to_wire(block: np.ndarray, ndf: int, nchk: int) -> np.ndarray:
    r6 = block.reshape(nchk, C.NCHAN_CHK, C.NPOL_SAMP, ndf, C.NSAMP_DF, 2)
    return np.ascontiguousarray(
        r6.transpose(3, 0, 4, 1, 2, 5).reshape(ndf, -1))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="paf_relayout")
    ap.add_argument("-a", "--input", required=True,
                    help="input .dada baseband recording (either layout; "
                    "detected from the ORDER header)")
    ap.add_argument("-b", "--output", required=True,
                    help="output .dada in the other layout")
    ap.add_argument("--ndf", type=int, default=C.NDF_BLK,
                    help="frames per block")
    ap.add_argument("--nchk", type=int, default=C.NCHK_NIC)
    args = ap.parse_args(argv)

    from ..io.dada import DadaFileReader, DadaFileWriter, DadaHeader

    with DadaFileReader(args.input) as r:
        hdr = DadaHeader(r.header)  # dict.copy() would drop the subclass
        to_rows = hdr.get("ORDER") != "SERIES"
        if to_rows:
            hdr["ORDER"] = "SERIES"
        else:
            hdr.pop("ORDER", None)
        block_nbytes = args.ndf * args.nchk * C.DT_SIZE
        n = 0
        with DadaFileWriter(args.output, hdr) as w:
            for raw in r.blocks(block_nbytes):
                x = np.frombuffer(raw, dtype="<i2")
                out = (wire_to_rows if to_rows else rows_to_wire)(
                    x, args.ndf, args.nchk)
                w.write(out)
                n += 1
    print(f"converted {n} blocks to "
          f"{'SERIES rows' if to_rows else 'wire TFTFP'}: {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
