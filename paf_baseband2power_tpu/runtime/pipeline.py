"""Streaming executor: the TPU-native replacement for the reference's
3-process ring-buffer pipeline.

Where the reference overlaps stages with OS processes + PSRDADA block queues
(``paf-baseband2power.py:117-127``; NBLK 8/4 deep ring buffers), this
executor overlaps them inside one process with JAX's async dispatch:

    host source  ->  device_put (H2D, async)  ->  jitted power step
                 ->  bounded in-flight queue  ->  fetch -> sink

``depth`` bounds the number of blocks in flight, playing the role of the
ring's NBLK: the host thread only blocks when the device is ``depth`` blocks
behind, giving the same producer/consumer pacing as ring-buffer
open/close-block without any IPC.

Failure policy mirrors the reference (SURVEY.md section 5): a source that
stops yields EOD and the pipeline drains and closes cleanly; per-block
timing is recorded for the statistics report (``capture.c:700-725``
analogue).
"""

from __future__ import annotations

import collections
import dataclasses
import time
from typing import Callable, Iterable, Iterator

import numpy as np

import jax

from .. import constants as C
from ..io.dada import DadaFileReader, DadaFileWriter, DadaHeader, output_header

from . import debug
from .log import open_log


@dataclasses.dataclass
class PipelineStats:
    nblocks: int = 0
    nbytes_in: int = 0
    nbytes_out: int = 0
    ndf: int = 0                     # frames per block (from the stream)
    elapsed: float = 0.0
    block_seconds: list = dataclasses.field(default_factory=list)

    @property
    def samples_per_sec(self) -> float:
        if not self.elapsed:
            return 0.0
        nsamp = self.nbytes_in // (C.NPOL_SAMP * C.NDIM_POL * C.NBYTE_IN)
        return nsamp * C.NPOL_SAMP / self.elapsed  # complex samples (both pols)

    @property
    def realtime_fraction(self) -> float:
        """How many real-time streams this run sustained (>=1 is real
        time). Uses the actual frames-per-block of the stream, so reduced
        test geometries report honestly."""
        if not self.elapsed or not self.ndf:
            return 0.0
        stream_sec = self.nblocks * self.ndf * C.TDF_SEC
        return stream_sec / self.elapsed


class SyntheticSource:
    """In-memory block generator (the software BMF, for tests/benchmarks)."""

    def __init__(self, nblocks: int, ndf: int = C.NDF_BLK,
                 nchk: int = C.NCHK_NIC, seed: int = 0, scale: float = 64.0):
        from ..ops.frame import synthetic_block

        self.header = None
        self._blocks = nblocks
        self._ndf, self._nchk = ndf, nchk
        self._seed, self._scale = seed, scale
        self._gen = synthetic_block

    def __iter__(self) -> Iterator[np.ndarray]:
        for i in range(self._blocks):
            b = self._gen(rng=self._seed + i, ndf=self._ndf, nchk=self._nchk,
                          scale=self._scale)
            yield b.reshape(self._ndf, -1)


class FileSource:
    """Replay a recorded DADA baseband file (the ``paf_diskdb`` analogue,
    ``diskdb.cu:74-124``: skip file header, stream whole blocks).

    Recordings made from a device-layout ring (header ``ORDER SERIES``)
    are auto-detected and viewed as series-row blocks; ``layout``
    overrides.
    """

    def __init__(self, path: str, ndf: int = C.NDF_BLK,
                 nchk: int = C.NCHK_NIC, layout: str | None = None):
        self._reader = DadaFileReader(path)
        self.header = self._reader.header
        self._ndf, self._nchk = ndf, nchk
        if layout is None:
            layout = ("rows" if (self.header or {}).get("ORDER") == "SERIES"
                      else "wire")
        if layout not in ("wire", "rows"):
            raise ValueError(f"unknown layout '{layout}'")
        self.layout = layout
        self.block_nbytes = ndf * nchk * C.DT_SIZE

    def __iter__(self) -> Iterator[np.ndarray]:
        for raw in self._reader.blocks(self.block_nbytes):
            x = np.frombuffer(raw, dtype="<i2")
            if self.layout == "rows":
                yield x.reshape(self._nchk * C.NCHAN_CHK * C.NPOL_SAMP, -1)
            else:
                yield x.reshape(self._ndf, -1)
        self._reader.close()


class FileSink:
    """Spill power records to a .dada file (the ``dada_dbdisk`` analogue)."""

    def __init__(self, path: str, header: DadaHeader | None = None):
        self._writer = DadaFileWriter(path, header or output_header())

    def write(self, power: np.ndarray) -> None:
        self._writer.write(np.ascontiguousarray(power, dtype="<f4"))

    def close(self) -> None:
        self._writer.close()


class MemorySink:
    """Collect power vectors in memory (tests)."""

    def __init__(self):
        self.records: list[np.ndarray] = []

    def write(self, power: np.ndarray) -> None:
        self.records.append(np.asarray(power).copy())

    def close(self) -> None:
        pass


class PowerPipeline:
    """Run source -> device power step -> sink with bounded overlap.

    With ``pfb_nfft`` set, the compute step is the streaming PFB
    spectrometer: the overlap-save history rides along as a device-resident
    carry between blocks (the boundary state a cuFFT channelizer would have
    forced on the reference's blocked design).
    """

    def __init__(self, power_fn: Callable | None = None, mean: bool = False,
                 depth: int = 2, name: str = "baseband2power",
                 log_dir: str | None = None, pfb_nfft: int = 0,
                 pfb_ntap: int = 4, pfb_window: str = "hamming",
                 fetch_every: int = 1, stokes: bool = False, nout: int = 1,
                 device_layout: bool = False):
        self._stateful = bool(pfb_nfft)
        self._signed = stokes  # Q/U/V records are legitimately negative
        self._device_layout = device_layout
        if power_fn is None and device_layout:
            power_fn = self._rows_fn(mean, pfb_nfft, pfb_ntap, pfb_window,
                                     stokes, nout)
        if power_fn is None:
            import functools

            on_tpu = jax.default_backend() == "tpu"
            if pfb_nfft and (stokes or nout > 1):
                # composed fine-channel modes: PFB x Stokes, PFB x tscrunch
                # waterfall, or all three — one streaming step (the fused
                # Pallas kernel on TPU for supported nfft, XLA otherwise)
                from ..ops.pfb import make_streaming_spectra

                power_fn = make_streaming_spectra(
                    pfb_nfft, pfb_ntap, nout=nout, stokes=stokes,
                    window=pfb_window, mean=mean)
            elif stokes and nout > 1:
                if on_tpu and nout % 2 == 0:
                    from ..ops.pallas_power import (
                        baseband2stokes_scrunch_pallas,
                    )

                    power_fn = functools.partial(
                        baseband2stokes_scrunch_pallas, nout=nout,
                        mean=mean)
                else:
                    from ..ops.power import baseband2stokes_scrunch_2d

                    power_fn = functools.partial(
                        baseband2stokes_scrunch_2d, nout=nout, mean=mean)
            elif nout > 1:
                if on_tpu:
                    from ..ops.pallas_power import (
                        baseband2power_scrunch_pallas,
                    )

                    power_fn = functools.partial(
                        baseband2power_scrunch_pallas, nout=nout, mean=mean)
                else:
                    from ..ops.power import baseband2power_scrunch_2d

                    power_fn = functools.partial(
                        baseband2power_scrunch_2d, nout=nout, mean=mean)
            elif pfb_nfft:
                power_fn = self._pfb_fn(mean, pfb_nfft, pfb_ntap, pfb_window)
            elif stokes:
                if on_tpu:
                    from ..ops.pallas_power import baseband2stokes_pallas

                    power_fn = functools.partial(
                        baseband2stokes_pallas, mean=mean)
                else:
                    from ..ops.power import baseband2stokes_2d

                    power_fn = functools.partial(baseband2stokes_2d,
                                                 mean=mean)
            else:
                power_fn = self._default_power_fn(mean)
        self._power_fn = power_fn
        # fetch_every > 1: stack that many (tiny) power outputs on device
        # and fetch them as one transfer. Each synchronous fetch costs a
        # fixed host<->device round trip (~30 ms through a remote tunnel);
        # batching amortizes it so high block cadences stay real-time. The
        # sink sees the same per-block records, fetch_every-1 blocks later.
        self._fetch_every = max(1, fetch_every)
        self._depth = max(self._fetch_every, max(1, depth))
        self.log = open_log(name, log_dir)

    @staticmethod
    def _default_power_fn(mean: bool):
        import functools

        from ..ops.pallas_power import baseband2power_pallas
        from ..ops.power import baseband2power_2d

        if jax.default_backend() == "tpu":
            return functools.partial(baseband2power_pallas, mean=mean)
        return functools.partial(baseband2power_2d, mean=mean)

    @staticmethod
    def _rows_fn(mean: bool, nfft: int, ntap: int, window: str,
                 stokes: bool, nout: int):
        """Compute step for host-corner-turned series-row blocks (the
        capture engine's ``device_layout`` mode): the fused spectrometer
        consumes the rows directly — no on-device corner turn (measured
        62 -> 15 ms/block at nfft=128 on v5e) — and the direct power /
        tscrunch reductions are layout-independent. Plain Stokes (and
        Stokes x tscrunch) route through the rows pair-product kernel
        ``baseband2stokes_scrunch_rows_pallas`` — adjacent x/y series
        rows, interleaved re/im lanes."""
        import functools

        if nfft:
            from ..ops.pallas_pfb import FUSED_NFFTS, pfb_spectra_fused

            if nfft not in FUSED_NFFTS:
                raise ValueError(
                    f"device-layout PFB supports nfft in {FUSED_NFFTS} "
                    f"(the fused kernel consumes rows directly), got "
                    f"{nfft}; re-record or use a wire-layout ring for "
                    "other sizes")
            # off-TPU (tests, CPU soaks) the kernel runs in interpret
            # mode — correct, slow, fine at test geometries
            interp = jax.default_backend() != "tpu"
            squeeze = nout == 1 and not stokes

            @jax.jit
            def step(block, history):
                out, h = pfb_spectra_fused(
                    block, nfft, ntap, window=window, mean=mean, nout=nout,
                    stokes=stokes, history=history, return_history=True,
                    layout="rows", interpret=interp)
                return (out[0] if squeeze else out), h

            return step
        if stokes:
            from ..ops.pallas_power import (
                baseband2stokes_scrunch_rows_pallas,
            )

            interp = jax.default_backend() != "tpu"
            squeeze = nout == 1

            @jax.jit
            def stokes_rows(block):
                out = baseband2stokes_scrunch_rows_pallas(
                    block, nout, mean=mean, interpret=interp)
                return out[0] if squeeze else out

            return stokes_rows
        if jax.default_backend() == "tpu":
            # HBM-bound Pallas rows power (matches the wire kernel's
            # streaming structure); XLA keeps CPU soaks/tests fast
            from ..ops.pallas_power import baseband2power_scrunch_rows_pallas

            if nout > 1:
                return functools.partial(baseband2power_scrunch_rows_pallas,
                                         nout=nout, mean=mean)

            @jax.jit
            def power1_pallas(block):
                return baseband2power_scrunch_rows_pallas(
                    block, 1, mean=mean)[0]

            return power1_pallas
        from ..ops.power import baseband2power_scrunch_rows

        if nout > 1:
            return functools.partial(baseband2power_scrunch_rows,
                                     nout=nout, mean=mean)

        @jax.jit
        def power1(block):
            return baseband2power_scrunch_rows(block, 1, mean=mean)[0]

        return power1

    @staticmethod
    def _pfb_fn(mean: bool, nfft: int, ntap: int, window: str):
        from ..ops.pfb import make_streaming_pfb

        # chunk_groups auto-resolved per method (whole-block sliding-DFT,
        # grouped fft); the step accepts the 2-D device layout directly
        # (reshape stays inside the single jitted program — no relayout at
        # a call boundary).
        return make_streaming_pfb(nfft, ntap, window=window, mean=mean)

    def warmup(self, ndf: int, nchk: int = C.NCHK_NIC) -> float:
        """Compile the power step for the stream geometry; returns seconds.

        Real-time callers must warm up before data starts flowing: the
        first-block JIT compile (tens of seconds on a remote-compile TPU)
        otherwise stalls the consumer, fills the ring, and trips the
        capture fall-behind policy. Runs on zeros of the production 2-D
        layout; the stateful PFB step is run twice to compile both the
        no-history and with-history programs.
        """
        import jax.numpy as jnp

        t0 = time.perf_counter()
        # zeros created on device: a host block would be 2.8 GB at full
        # geometry and ship it through the (slow) H2D path for nothing
        if self._device_layout:
            x = jnp.zeros((nchk * C.NCHAN_CHK * C.NPOL_SAMP, ndf, 256),
                          dtype=jnp.int16)
        else:
            x = jnp.zeros((ndf, nchk * C.DT_SIZE // 2), dtype=jnp.int16)
        if self._stateful:
            out, carry = self._power_fn(x, None)
            np.asarray(out)
            out, _ = self._power_fn(x, carry)
        else:
            out = self._power_fn(x)
        np.asarray(out)
        if self._fetch_every > 1:
            # the stacked-fetch program is distinct — compiling it on the
            # first mid-stream flush would stall the ring reader
            np.asarray(jnp.stack([out] * self._fetch_every))
        dt = time.perf_counter() - t0
        self.log.info("warmup: compiled power step for (%d, %d) in %.2f s",
                      ndf, nchk, dt)
        return dt

    def run(self, source: Iterable[np.ndarray], sink) -> PipelineStats:
        import jax.numpy as jnp

        stats = PipelineStats()
        inflight: collections.deque = collections.deque()  # (array, nblocks)
        pending: list = []           # device outs awaiting a stacked fetch
        t_start = time.perf_counter()
        t_block = t_start
        carry = None
        self.log.info("pipeline start: depth=%d fetch_every=%d stateful=%s",
                      self._depth, self._fetch_every, self._stateful)

        def blocks_in_flight() -> int:
            return sum(n for _, n in inflight) + len(pending)

        def flush_pending():
            if not pending:
                return
            if len(pending) == 1:
                inflight.append((pending[0], 1))
            else:
                inflight.append((jnp.stack(pending), len(pending)))
            pending.clear()

        def drain_one():
            nonlocal t_block
            arr, n = inflight.popleft()
            host = np.asarray(arr)
            rows = host[None] if n == 1 else host
            now = time.perf_counter()
            per_block = (now - t_block) / n
            for row in rows:
                if debug.debug_enabled():
                    debug.check_power(row, stats.nblocks,
                                      signed=self._signed)
                    self.log.info("block %d ok: sum=%.6g max=%.6g",
                                  stats.nblocks, row.sum(), row.max())
                sink.write(row)
                stats.block_seconds.append(per_block)
                stats.nbytes_out += row.size * 4
                stats.nblocks += 1
            t_block = now

        try:
            for block in source:
                if self._device_layout and block.ndim == 2:
                    # rows blocks go H2D 3-D (nseries, ndf, 256): the
                    # host reshape is free, and a 2-D device array costs
                    # a full tiled-relayout copy in front of every rows
                    # kernel (measured ~8 ms/block at full geometry)
                    block = block.reshape(block.shape[0], -1, 256)
                if not stats.ndf:
                    # frames per block: rows-layout blocks are
                    # (nseries, ndf, 256), wire blocks (ndf, lanes)
                    stats.ndf = (block.shape[1]
                                 if self._device_layout else block.shape[0])
                x = jax.device_put(block)
                if self._stateful:
                    out, carry = self._power_fn(x, carry)
                else:
                    out = self._power_fn(x)
                pending.append(out)
                if len(pending) >= self._fetch_every:
                    flush_pending()
                stats.nbytes_in += block.nbytes
                while blocks_in_flight() > self._depth and inflight:
                    drain_one()
            flush_pending()
            while inflight:
                drain_one()
            stats.elapsed = time.perf_counter() - t_start
        finally:
            sink.close()
        self.log.info(
            "pipeline done: %d blocks, %.3f s, %.3g samp/s, %.2fx real time",
            stats.nblocks, stats.elapsed, stats.samples_per_sec,
            stats.realtime_fraction,
        )
        return stats
