"""Cross-stream vocoder micro-batching.

The shared-wave scheduler (``runtime/wave.py``) lets N independent
streaming clients share one t2s decode kernel, but each client still
vocodes its 1-second chunk SOLO — and measured on v5e the solo chunk is
~9-11 ms device (enc_p ~4.5 + flow/HiFi-GAN ~4.8) plus ~1.7 ms dispatch,
while ``flow_dec`` at B=4 costs only ~2.8 ms/stream.  Since all clients
in a wave hit their chunk boundary on the same decode step, their vocode
calls arrive as a burst: this module collects that burst for a few
milliseconds and runs ONE batched program
(``models/sovits.py:decode_core_stream_padded_batch`` + batched
``flow_dec``) over up to ``max_batch`` rows — roughly halving per-stream
vocoder device time and quartering dispatch overhead.

The reference has no equivalent: its streaming clients serialize the
whole pipeline behind ``_infer_lock`` (``TTS.py:145``), so its vocoder
never sees concurrent chunks at all.
"""
from __future__ import annotations

import functools
import queue
import threading
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import sovits as _sovits_model
from ..models.sovits import STREAM_PAD_MULTIPLE
from .t2s_session import _round_up

__all__ = ["VocoderBatcher"]


class _Item:
    __slots__ = ("sovits", "codes", "text", "ge", "noise_scale", "y_overlap",
                 "vsi", "overlap_len", "event", "result", "error", "picked")

    def __init__(self, sovits, codes, text, ge, noise_scale, y_overlap, vsi,
                 overlap_len):
        self.sovits = sovits
        self.codes = codes            # np [n] int
        self.text = text              # np [N] int
        self.ge = ge                  # jnp [1, gin, 1]
        self.noise_scale = float(noise_scale)
        self.y_overlap = y_overlap    # jnp [1, H, ov] or None (first chunk)
        self.vsi = int(vsi)
        self.overlap_len = int(overlap_len)
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None
        self.picked = False           # dequeued by the worker (in flight)


class VocoderBatcher:
    """Leader-collect micro-batcher for streaming vocoder chunks.

    Client threads call :meth:`decode_stream` (same contract as the
    bucketed branch of ``TTS._sovits_decode_stream`` at ``speed == 1``);
    a worker thread drains the submission queue, waits ``window_s`` for
    the rest of the wave's burst, groups compatible rows, and dispatches
    one batched program per group.  Lone rows fall through to the solo
    path — no batched compile is paid until two streams actually
    coincide."""

    #: batch-size buckets — one compiled fused program per bucket;
    #: intermediate group sizes pad up with masked dummy rows.  The 8
    #: bucket only engages when ``max_batch`` is raised above the default
    #: 4 (multi-wave hosts: two B=4 decode waves share one vocoder)
    B_BUCKETS = (2, 4, 8)

    def __init__(self, tts, max_batch: int = 4, window_s: float = 0.004):
        self.tts = tts
        self.max_batch = min(max_batch, max(self.B_BUCKETS))
        self.window_s = window_s
        self._q: "queue.Queue[_Item]" = queue.Queue()
        self._closed = False
        self._stats_lock = threading.Lock()
        self.stats = {"batches": 0, "rows": 0, "solo_rows": 0,
                      "max_group": 0, "windowless": 0}
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="gsv-vocoder-batcher")
        self._thread.start()

    # -- client surface --------------------------------------------------

    def decode_stream(self, sovits, codes, text, ge, noise_scale,
                      y_overlap, valid_start_idx, overlap_len):
        """Blocking: returns ``(audio [1,1,T], attn [H,2n,N],
        new_overlap [1,H,ov])`` exactly as the solo bucketed path."""
        if self._closed:
            raise RuntimeError("VocoderBatcher is closed")
        it = _Item(sovits, np.asarray(codes, np.int32).reshape(-1),
                   np.asarray(text, np.int32).reshape(-1), ge, noise_scale,
                   y_overlap, valid_start_idx, overlap_len)
        self._q.put(it)
        # poll-wait so a close() racing this enqueue cannot strand the
        # caller (close drains the queue, but an item put after its drain
        # would otherwise block forever).  An item the worker already
        # PICKED is still in flight — its result lands when the running
        # group finishes (possibly after close()'s join timeout expires on
        # a slow first compile), so only give up on it once the worker
        # thread itself is gone.
        while not it.event.wait(1.0):
            if (self._closed and it.error is None and it.result is None
                    and (not it.picked or not self._thread.is_alive())):
                raise RuntimeError("VocoderBatcher closed mid-request")
        if it.error is not None:
            raise it.error
        return it.result

    def close(self):
        self._closed = True
        self._q.put(None)  # wake the worker
        self._thread.join(timeout=10.0)
        # fail anything still queued — their decode_stream callers are
        # blocked on event.wait
        while True:
            try:
                it = self._q.get_nowait()
            except queue.Empty:
                break
            if it is not None:
                it.error = RuntimeError("VocoderBatcher closed")
                it.event.set()

    def _active_clients(self) -> int:
        """Concurrent shared-stream clients (the scheduler's admission
        counter covers each stream's whole life).  Unknown ⇒ assume a
        burst is possible and keep the collect window."""
        try:
            stats = self.tts.wave_stats()
        except Exception:  # noqa: BLE001 — stub/partial facades
            return 2
        n = 0
        for st in stats.values():
            c = st.get("clients") if isinstance(st, dict) else None
            if isinstance(c, int):
                n += c
        return n

    # -- worker ----------------------------------------------------------

    def _run(self):
        import time

        while not self._closed:
            try:
                first = self._q.get(timeout=0.2)
            except queue.Empty:
                continue
            if first is None:
                continue
            first.picked = True
            items = [first]
            # a LONE shared stream (the common unsaturated case) pays the
            # whole collect window per chunk for zero batching benefit —
            # skip the wait when <2 clients are active, but still drain
            # anything ALREADY queued (a burst that landed while the
            # previous group ran)
            if self._active_clients() >= 2:
                deadline = time.monotonic() + self.window_s
            else:
                deadline = time.monotonic()
                with self._stats_lock:
                    self.stats["windowless"] += 1
            while len(items) < self.max_batch:
                remaining = deadline - time.monotonic()
                try:
                    nxt = (self._q.get(timeout=remaining) if remaining > 0
                           else self._q.get_nowait())
                except queue.Empty:
                    break
                if nxt is None:
                    break
                nxt.picked = True
                items.append(nxt)
            groups: Dict[Tuple, List[_Item]] = {}
            for it in items:
                groups.setdefault((id(it.sovits), it.overlap_len), []).append(it)
            for group in groups.values():
                try:
                    self._run_group(group)
                except Exception as exc:  # noqa: BLE001 — fail the callers
                    for it in group:
                        it.error = exc
                        it.event.set()

    def decode_many(self, specs) -> list:
        """Synchronous batched dispatch on the CALLER's thread (no window
        wait): ``specs`` is a list of ``(sovits, codes, text, ge,
        noise_scale, y_overlap, vsi, overlap_len)`` tuples; returns the
        per-spec ``(audio, attn, new_overlap)`` results in order.  This is
        the entry for single-threaded consumers that already know which
        requests' chunks coincide (``tts.infer_batched_stream`` with the
        engine's grouped event mode)."""
        items = [_Item(*spec) for spec in specs]
        groups: Dict[Tuple, List[_Item]] = {}
        for it in items:
            groups.setdefault((id(it.sovits), it.overlap_len), []).append(it)
        for group in groups.values():
            for i in range(0, len(group), self.max_batch):
                # exceptions propagate to the (single, synchronous) caller
                # directly — nothing else waits on these items' events
                self._run_group(group[i:i + self.max_batch])
        return [it.result for it in items]

    def _run_group(self, items: List[_Item]):
        # both the worker thread (decode_stream path) and decode_many
        # caller threads run here — guard the read-modify-write counters
        with self._stats_lock:
            self.stats["batches"] += 1
            self.stats["rows"] += len(items)
            self.stats["max_group"] = max(self.stats["max_group"], len(items))
            if len(items) == 1:
                self.stats["solo_rows"] += 1
        if len(items) == 1:
            it = items[0]
            it.result = self.tts._sovits_decode_stream(
                it.sovits, it.codes[None, None, :], it.text[None, :], it.ge,
                noise_scale=it.noise_scale, speed=1.0,
                y_overlap=it.y_overlap, valid_start_idx=it.vsi,
                overlap_len=it.overlap_len)
            it.event.set()
            return

        tts = self.tts
        sovits = items[0].sovits
        cfg = sovits.cfg
        dtype = tts.tts_config.dtype
        overlap_len = items[0].overlap_len
        B = next(b for b in self.B_BUCKETS if b >= len(items))
        CB = STREAM_PAD_MULTIPLE
        Bc = _round_up(max(max(it.codes.size for it in items), 1), CB)
        Np = _round_up(max(max(it.text.size for it in items), 1), CB)
        T50 = 2 * Bc

        codes_pad = np.zeros((B, 1, Bc), np.int32)
        text_pad = np.zeros((B, Np), np.int32)
        codes_len = np.ones((B,), np.int32)
        text_len = np.ones((B,), np.int32)
        vsi = np.zeros((B,), np.int32)
        blend = np.zeros((B,), bool)
        scales = np.zeros((B,), np.float32)
        ge_rows = []
        yov_rows = []
        H = cfg.hidden_channels
        for i, it in enumerate(items):
            codes_pad[i, 0, :it.codes.size] = it.codes
            text_pad[i, :it.text.size] = it.text
            codes_len[i] = it.codes.size
            text_len[i] = it.text.size
            vsi[i] = it.vsi
            blend[i] = it.y_overlap is not None
            scales[i] = it.noise_scale
            ge_rows.append(jnp.asarray(it.ge, dtype))
            yov_rows.append(it.y_overlap if it.y_overlap is not None
                            else jnp.zeros((1, H, overlap_len), dtype))
        for i in range(len(items), B):  # masked dummy rows
            ge_rows.append(ge_rows[0])
            yov_rows.append(jnp.zeros((1, H, overlap_len), dtype))
        ge_b = jnp.concatenate(ge_rows, axis=0)
        yov_b = jnp.concatenate(yov_rows, axis=0).astype(dtype)
        noise = (jax.random.normal(tts._next_rng(),
                                   (B, cfg.inter_channels, T50), jnp.float32)
                 * jnp.asarray(scales)[:, None, None]).astype(dtype)

        # one FUSED program (core + bucket pad + flow/HiFi-GAN): over a
        # dispatch-latency link (axon tunnel) the split core/pad/flow
        # sequence measured ~18 ms/chunk regardless of B — dispatch-bound —
        # while one program is ~7 ms; fusing also lets XLA overlap the
        # boundary ops on chip
        t_valid = 2 * codes_len - vsi  # [B]
        tmax = int(t_valid[:len(items)].max())
        bucket = tts._flow_bucket(tmax)
        audio, attn, new_ov = _stream_batch_fused_jit(
            sovits.params, cfg, jnp.asarray(codes_pad),
            jnp.asarray(codes_len), jnp.asarray(text_pad),
            jnp.asarray(text_len), ge_b, noise, yov_b, jnp.asarray(vsi),
            jnp.asarray(blend), overlap_len, bucket)
        audio = np.asarray(audio)
        attn = np.asarray(attn)
        spf = cfg.samples_per_frame
        for i, it in enumerate(items):
            n = it.codes.size
            it.result = (
                audio[i:i + 1, :, : int(t_valid[i]) * spf],
                attn[i][..., :2 * n, :it.text.size],
                # keep the overlap ON DEVICE — it feeds the next chunk's
                # y_overlap input, so a host round-trip here would add one
                # upload per stream per chunk that the solo path never pays
                new_ov[i:i + 1])
            it.event.set()


@functools.partial(jax.jit,
                   static_argnames=("cfg", "overlap_len", "bucket"))
def _stream_batch_fused_jit(params, cfg, codes_pad, codes_len, text_pad,
                            text_len, ge, noise, y_ov, vsi, blend,
                            overlap_len, bucket):
    """Whole batched streaming chunk in ONE program: padded/masked core
    (quantizer + MRTE + enc_p + projection + per-row slice/blend) → static
    ``bucket``-frame pad → flow reverse + HiFi-GAN.  One compiled
    executable per (B, codes-bucket, text-bucket, flow-bucket) tuple; one
    dispatch per group (the split sequence measured dispatch-bound over
    the axon tunnel).  Returns (audio [B,1,bucket*spf], attn, new_ov)."""
    z_p, mask, attn, new_ov = _sovits_model.decode_core_stream_padded_batch(
        params, cfg, codes_pad, codes_len, text_pad, text_len, ge, noise,
        y_ov, vsi, blend, overlap_len=overlap_len)
    T50 = z_p.shape[-1]
    if bucket <= T50:
        z_p = z_p[:, :, :bucket]
        mask = mask[:, :, :bucket]
    else:
        z_p = jnp.pad(z_p, [(0, 0), (0, 0), (0, bucket - T50)])
        mask = jnp.pad(mask, [(0, 0), (0, 0), (0, bucket - T50)])
    audio = _sovits_model.flow_dec(params, cfg, z_p, mask, ge)
    return audio, attn, new_ov
