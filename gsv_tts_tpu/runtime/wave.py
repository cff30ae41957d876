"""Open-ended streaming continuous batching: the wave scheduler.

The engine's ``generate_batched_stream`` (t2s_session.py) requires every
request up front — one caller owns the whole wave.  Real serving is N
INDEPENDENT streaming clients arriving at different times (the reference
serializes them behind ``_infer_lock``, ``TTS.py:145``; its continuous
batching, ``t2s_model.py:555-734``, is likewise single-caller).  This
module turns the same slot machinery (``prefill_batch`` / ``prefill_slot``
/ ``decode_chunk``) into an attach/detach service:

* :meth:`WaveScheduler.attach` can be called from any thread at any time;
  it returns a :class:`StreamHandle` that yields the request's semantic
  tokens incrementally (same emission semantics as
  ``generate_batched_stream``: the prefill sample and the current
  interval's last sample are withheld, nothing past a sampled EOS is ever
  emitted).
* A dedicated driver thread owns the device state and runs decode chunks
  whenever any slot is live.  New requests are prefilled into free slots
  mid-wave (``prefill_slot`` — the reference's slot-refill trick,
  ``t2s_model.py:696-722``, applied across *independent* clients).
* The wave grows and shrinks between batch buckets: when requests queue
  and no slot is free it resizes to the next larger ``gpt_cache`` batch
  bucket, and when live slots drop to <= B/2 it compacts the survivors
  into the smallest bucket that fits (``T2SEngine._gather_live`` — one on-device
  gather copy, no re-prefill), so a lone tail request decodes at the B=1
  kernel rate instead of burning a B=4 wave.

Requests are grouped into waves by sampling signature (top_k/top_p/
temperature/repetition_penalty are jit-static and apply wave-wide, as in
the reference's batched mode); waves with distinct signatures time-share
the chip round-robin.
"""
from __future__ import annotations

import logging
import queue
import threading
from collections import deque
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .t2s_session import (DecodeState, SampleArgs, SlotHarvest, T2SEngine,
                          decode_chunk, freeze_slot, prefill_batch,
                          prompt_rows)

__all__ = ["WaveScheduler", "StreamHandle", "WaveOverloadedError"]


class WaveOverloadedError(RuntimeError):
    """Raised by :meth:`WaveScheduler.acquire_client` when the scheduler
    already serves ``max_clients`` concurrent streaming clients.  Serving
    maps this to HTTP 503 + ``Retry-After`` so direct-connect clients see
    bounded TTFT instead of unbounded queueing past the saturation knee
    (``bench.py --saturation``); the multi-host analogue is the router's
    ``--max-outstanding`` shedding."""


class StreamHandle:
    """Consumer side of one attached request.

    Iterate to receive ``np.int64`` token arrays; iteration ends when the
    request finishes.  Thread-safe; ``cancel()`` detaches the request
    (its slot is freed at the scheduler's next round)."""

    def __init__(self):
        self._q: "queue.Queue" = queue.Queue()
        self._cancelled = threading.Event()
        self.done = False

    # -- producer (scheduler) side --------------------------------------
    def _emit(self, tokens: np.ndarray, done: bool):
        self._q.put(("tok", tokens, done))

    def _fail(self, exc: BaseException):
        self._q.put(("err", exc, True))

    # -- consumer side ---------------------------------------------------
    @property
    def cancelled(self) -> bool:
        return self._cancelled.is_set()

    def cancel(self):
        """Detach: the slot is freed at the next scheduling round and no
        further tokens are emitted (mirrors a client disconnect)."""
        self._cancelled.set()
        self._q.put(("tok", np.zeros(0, np.int64), True))

    def get(self, timeout: Optional[float] = None) -> Tuple[np.ndarray, bool]:
        """Blocking fetch of the next ``(tokens, done)`` event."""
        kind, payload, done = self._q.get(timeout=timeout)
        if kind == "err":
            raise payload
        return payload, done

    def __iter__(self):
        while True:
            tokens, done = self.get()
            yield tokens, done
            if done:
                self.done = True
                return


class _Slot:
    __slots__ = ("handle", "harvest", "live")

    def __init__(self, handle: Optional[StreamHandle] = None):
        self.handle = handle
        self.harvest = SlotHarvest()
        self.live = handle is not None


class _Request:
    __slots__ = ("x", "y", "bert", "handle")

    def __init__(self, x, y, bert, handle):
        self.x = x
        self.y = y
        self.bert = bert
        self.handle = handle


class _Wave:
    def __init__(self, sa: SampleArgs, rng: jax.Array):
        self.sa = sa
        self.rng = rng  # split at every state creation (one key/generation)
        self.state: Optional[DecodeState] = None
        self.slots: List[_Slot] = []
        self.pending: "deque[_Request]" = deque()
        self.first_chunk = True
        # counters (exported via WaveScheduler.stats)
        self.n_attached = 0
        self.n_finished = 0
        self.n_refills = 0
        self.n_batched_refills = 0
        self.n_resizes = 0


class WaveScheduler:
    """Serving-side continuous batching over one :class:`T2SEngine`.

    One instance per loaded GPT model; clients on any thread call
    :meth:`attach` and consume the returned handle.  ``max_batch`` caps
    the wave at the batch bucket where the fused kernel still wins
    (B<=4 on v5e — two B=4 waves beat any B>4 config, see PLAN.md)."""

    def __init__(self, engine: T2SEngine, max_batch: int = 4,
                 seed: int = 0, max_clients: Optional[int] = None):
        self.engine = engine
        bucket_sizes = sorted(engine.buckets.keys())
        self.max_batch = min(max_batch, bucket_sizes[-1])
        #: admission cap on concurrent streaming CLIENTS (a client may
        #: attach many segment requests over its life — the cap is on
        #: clients, so an admitted stream never gets rejected mid-utterance)
        self.max_clients = max_clients
        self._n_clients = 0
        self._waves: Dict[Tuple, _Wave] = {}
        self._lock = threading.Lock()
        self._work = threading.Event()
        self._closed = False
        self._seed_rng = np.random.RandomState(seed)
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="gsv-wave-scheduler")
        self._thread.start()

    # ------------------------------------------------------------------
    # client surface
    # ------------------------------------------------------------------

    def attach(self, x_ids, y_ids, bert, top_k: int = 15, top_p: float = 1.0,
               temperature: float = 1.0,
               repetition_penalty: float = 1.35) -> StreamHandle:
        """Register one request; returns its :class:`StreamHandle`.

        Raises ``ValueError`` immediately if the prompt cannot fit the
        largest cache bucket at a batch size this scheduler uses."""
        x = np.asarray(x_ids, np.int32).reshape(-1)
        y = np.asarray(y_ids, np.int32).reshape(-1)
        b = np.asarray(bert, np.float32).reshape(len(x), -1)
        # the prefill writes the PADDED [Lx|Ly] block into the cache and
        # generation needs one step of headroom — guard on that need, not
        # the raw prompt length (a 500+10 prompt pads to 512+32).  Scan
        # only the batch buckets this scheduler actually uses (<=
        # max_batch, same set as _bucket_sizes): a bucket the wave can
        # never run at must not admit the request, else it fails
        # asynchronously in _create_wave_state instead of here
        need = self._prompt_need(x, y)
        if not any(self._pick_S(bb, need - 1) is not None
                   for bb in self._bucket_sizes()):
            raise ValueError(
                f"prompt length {len(x) + len(y)} (padded cache need {need}) "
                f"exceeds every gpt_cache bucket at batch <= {self.max_batch}")
        # batched-mode sampling semantics: wave-wide args, no repetition
        # penalty over generated tokens (reference ``t2s_model.py:651``)
        sa = SampleArgs(top_k=int(top_k), top_p=float(top_p),
                        temperature=float(temperature),
                        repetition_penalty=float(repetition_penalty),
                        use_prev=False)
        handle = StreamHandle()
        sig = (sa.top_k, sa.top_p, sa.temperature, sa.repetition_penalty)
        with self._lock:
            # checked under the SAME lock close() takes: an attach racing
            # close() must either fail here or have its request visible to
            # close()'s pending sweep — never enqueue after the driver died
            if self._closed:
                raise RuntimeError("WaveScheduler is closed")
            wave = self._waves.get(sig)
            if wave is None:
                wave = _Wave(sa, jax.random.PRNGKey(
                    int(self._seed_rng.randint(0, 2**31 - 1))))
                self._waves[sig] = wave
            wave.pending.append(_Request(x, y, b, handle))
            wave.n_attached += 1
        self._work.set()
        return handle

    def acquire_client(self) -> None:
        """Admission control: claim one concurrent-client slot (call once
        per streaming CLIENT, not per attach — ``TTS.stream_shared`` holds
        it for the client's whole multi-segment life).  Raises
        :class:`WaveOverloadedError` at the ``max_clients`` cap."""
        with self._lock:
            if self._closed:
                raise RuntimeError("WaveScheduler is closed")
            if (self.max_clients is not None
                    and self._n_clients >= self.max_clients):
                raise WaveOverloadedError(
                    f"{self._n_clients} active streaming clients "
                    f"(max_clients={self.max_clients})")
            self._n_clients += 1

    def release_client(self) -> None:
        with self._lock:
            self._n_clients = max(0, self._n_clients - 1)

    @property
    def overloaded(self) -> bool:
        """True when a new :meth:`acquire_client` would be rejected
        (advisory — the authoritative check is acquire itself)."""
        with self._lock:
            return (self.max_clients is not None
                    and self._n_clients >= self.max_clients)

    def close(self):
        with self._lock:
            self._closed = True
        self._work.set()
        self._thread.join(timeout=30.0)
        with self._lock:
            for wave in self._waves.values():
                for req in wave.pending:
                    req.handle._fail(RuntimeError("WaveScheduler closed"))
                for slot in wave.slots:
                    if slot.live and slot.handle is not None:
                        slot.handle._fail(RuntimeError("WaveScheduler closed"))
            self._waves.clear()

    @property
    def stats(self) -> Dict:
        with self._lock:
            waves = []
            for sig, w in self._waves.items():
                waves.append({
                    "signature": list(sig),
                    "batch": len(w.slots),
                    "live": sum(1 for s in w.slots if s.live),
                    "pending": len(w.pending),
                    "attached": w.n_attached,
                    "finished": w.n_finished,
                    "refills": w.n_refills,
                    "batched_refills": w.n_batched_refills,
                    "resizes": w.n_resizes,
                })
            clients = self._n_clients
        return {"waves": waves, "max_batch": self.max_batch,
                "clients": clients, "max_clients": self.max_clients}

    # ------------------------------------------------------------------
    # driver thread
    # ------------------------------------------------------------------

    def _run(self):
        while not self._closed:
            progressed = False
            with self._lock:
                waves = list(self._waves.values())
            for wave in waves:
                try:
                    progressed |= self._pump(wave)
                except Exception as exc:  # noqa: BLE001 — fail the wave's clients
                    logging.exception("wave scheduler failure")
                    # fail only the INSTALLED streams (their device state
                    # died); popped-but-uninstalled requests were already
                    # failed at the raise site, and still-PENDING requests
                    # are untouched by the dead wave — they are served by
                    # the recreated wave (each fails at most once, at its
                    # own prefill, if the failure persists).  Sweeping
                    # pending here would also race attach(): a request
                    # enqueued between the raise and this handler would be
                    # nuked with a stale error.
                    for slot in wave.slots:
                        if slot.live and slot.handle is not None:
                            slot.handle._fail(exc)
                            slot.live = False
                    wave.state = None
                    wave.slots = []
            # drop idle waves (frees their HBM caches).  Clear the work
            # event BEFORE the idleness check: an attach() landing between
            # the check and a check-then-clear would have its wakeup
            # erased (lost-wakeup race, up to the full wait timeout of
            # added TTFT) — cleared-first, that attach re-sets the event
            # after our clear and the wait returns immediately.
            if not progressed:
                self._work.clear()
            with self._lock:
                for sig in [s for s, w in self._waves.items()
                            if w.state is None and not w.pending]:
                    del self._waves[sig]
                idle = not any(w.pending or any(s.live for s in w.slots)
                               for w in self._waves.values())
            if not progressed and idle:
                self._work.wait(timeout=0.2)

    # -- wave mechanics --------------------------------------------------

    def _bucket_sizes(self) -> List[int]:
        return sorted(b for b in self.engine.buckets if b <= self.max_batch) \
            or [sorted(self.engine.buckets)[0]]

    def _pick_B(self, n: int) -> int:
        sizes = self._bucket_sizes()
        return next((b for b in sizes if b >= n), sizes[-1])

    def _pick_S(self, B: int, needed: int) -> Optional[int]:
        lens = self.engine.buckets[B]
        return next((s for s in lens if s > needed), None)

    @staticmethod
    def _prompt_need(x, y) -> int:
        """Cache rows a request's prefill + first decode step need
        (:func:`prompt_rows`; batched refills must additionally fit the
        GROUP pad — ``_refill`` checks that)."""
        return prompt_rows(x, y)

    def _take_pending(self, wave: _Wave, k: int) -> List[_Request]:
        out = []
        with self._lock:
            while wave.pending and len(out) < k:
                req = wave.pending.popleft()
                if req.handle.cancelled:
                    continue
                out.append(req)
        return out

    def _create_wave_state(self, wave: _Wave):
        """First prefill: same construction as ``generate_batched_stream``
        (common-shape padded prompts, dummy 1/1 prompts in dead slots)."""
        eng = self.engine
        cfg = eng.cfg
        with self._lock:
            n_wait = len(wave.pending)
        B = self._pick_B(max(1, n_wait))
        reqs = self._take_pending(wave, B)
        if not reqs:
            return False
        try:
            return self._create_wave_state_for(wave, reqs, B)
        except Exception as exc:
            # fail the POPPED requests before re-raising: they are in
            # neither wave.pending nor wave.slots, so _run's wave-failure
            # sweep cannot see them — without this their StreamHandles
            # (and the stream_shared threads blocked on them, plus their
            # admission slots) would hang forever
            for r in reqs:
                r.handle._fail(exc)
            raise

    def _create_wave_state_for(self, wave: _Wave, reqs: List[_Request],
                               B: int) -> bool:
        eng = self.engine
        cfg = eng.cfg
        xs, ys, bs, x_lens, y_lens = eng._pad_prompts(
            [(r.x, r.y, r.bert) for r in reqs], B)
        Lx, Ly = xs.shape[1], ys.shape[1]
        prompt_max = int((x_lens + y_lens).max())
        S = self._pick_S(B, max(prompt_max, Lx + Ly - 1))
        if S is None:
            # no S bucket at this B holds the biggest padded prompt (e.g.
            # per-B bucket lists, or a prompt that only fits the B=1
            # buckets).  Requeue and open the wave with just the HEAD
            # request at a batch bucket that fits it — the rest join via
            # refill/growth (which re-check fit per request).  attach's
            # guard guarantees some bucket fits every admitted request.
            # mutate ``reqs`` IN PLACE: the caller's except-path fails
            # exactly the in-hand list, and requeued requests must not be
            # failed (they are safely back in pending)
            with self._lock:
                for r in reversed(reqs):
                    wave.pending.appendleft(r)
            reqs.clear()
            reqs.extend(self._take_pending(wave, 1))
            if not reqs:
                return False
            r0 = reqs[0]
            need = self._prompt_need(r0.x, r0.y)
            fit = next((b for b in self._bucket_sizes()
                        if self._pick_S(b, need - 1) is not None), None)
            if fit is None:  # cannot happen after attach's guard
                r0.handle._fail(ValueError("prompt fits no gpt_cache bucket"))
                return True
            B = fit
            xs, ys, bs, x_lens, y_lens = eng._pad_prompts(
                [(r0.x, r0.y, r0.bert)], B)
            Lx, Ly = xs.shape[1], ys.shape[1]
            prompt_max = len(r0.x) + len(r0.y)
            S = self._pick_S(B, max(prompt_max, Lx + Ly - 1))
        k_cache, v_cache = eng._alloc_cache(B, S)
        # fresh key per wave GENERATION: re-creating a drained wave with
        # the construction-time key would replay the identical gumbel
        # chain across generations (correlated sampling between clients)
        wave.rng, sub = jax.random.split(wave.rng)
        state, _ = prefill_batch(
            eng.params, cfg, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(bs),
            jnp.asarray(x_lens), jnp.asarray(y_lens), k_cache, v_cache,
            sub, wave.sa, False, eng._dtype_name(), eng.attn_impl)
        wave.state = state
        wave.slots = [_Slot(r.handle) for r in reqs] + \
            [_Slot() for _ in range(B - len(reqs))]
        # freeze the dummy slots
        for j in range(len(reqs), B):
            wave.state = self._freeze(wave.state, j)
        wave.first_chunk = True
        return True

    _freeze = staticmethod(freeze_slot)

    def _refill(self, wave: _Wave, jobs: List[Tuple[int, _Request]]) -> bool:
        """Prefill each ``(slot, request)`` job — ONE batched dispatch when
        several arrive together (``prefill_slots``; burst arrivals and
        wave growth pay one weight read + launch instead of k), the plain
        ``prefill_slot`` otherwise.  If a prompt does not fit the wave's
        CURRENT sequence bucket, escalate the wave to the smallest bucket
        fitting the whole batch first; if no bucket at this batch size
        fits some request, requeue it and everything behind it (FIFO
        preserved — they are admitted when the wave drains and re-creates
        at a compatible (B, S)) and return False — an unchecked prefill
        would shape-error and fail every client in the wave."""
        eng = self.engine
        S_cur = wave.state.k_cache.shape[2]
        B = len(wave.slots)
        S_max = max(eng.buckets[B])
        admit: List[Tuple[int, _Request]] = []
        for n, (j, req) in enumerate(jobs):
            if self._prompt_need(req.x, req.y) > S_max:
                with self._lock:  # requeue this and everything behind it
                    for _, r in reversed(jobs[n:]):
                        wave.pending.appendleft(r)
                break
            admit.append((j, req))
        if not admit:
            return False
        try:
            # group-pad fit checks, escalation and batched-vs-per-slot
            # dispatch live in the shared engine helper (one definition
            # with ``generate_batched_stream``)
            state, batched = eng._refill_slots_prefill(
                wave.state, [j for j, _ in admit],
                [(r.x, r.y, r.bert) for _, r in admit], wave.sa)
            if state.k_cache.shape[2] != S_cur:
                wave.n_resizes += 1
            if batched:
                wave.n_batched_refills += 1
            wave.state = state
        except Exception as exc:
            # popped-but-not-installed requests are invisible to _run's
            # wave-failure sweep (neither pending nor slots) — fail their
            # handles here or their consumers block forever
            for _, r in admit:
                r.handle._fail(exc)
            raise
        for j, req in admit:
            wave.slots[j] = _Slot(req.handle)
            wave.n_refills += 1
        return len(admit) == len(jobs)

    def _resize(self, wave: _Wave, new_B: int) -> bool:
        """Gather live slots into a ``new_B``-slot wave (growth or
        compaction).  Returns False when no compatible S bucket exists."""
        live_idx = [j for j, s in enumerate(wave.slots) if s.live]
        new_state = self.engine._gather_live(wave.state, live_idx, new_B)
        if new_state is None:
            return False
        new_slots = [wave.slots[old] for old in live_idx[:new_B]]
        new_slots += [_Slot() for _ in range(new_B - len(new_slots))]
        wave.state = new_state
        wave.slots = new_slots
        wave.n_resizes += 1
        return True

    def _pump(self, wave: _Wave) -> bool:
        eng = self.engine
        cfg = eng.cfg

        # 0. honor cancels before spending device time
        for j, slot in enumerate(wave.slots):
            if slot.live and slot.handle.cancelled:
                slot.live = False
                wave.state = self._freeze(wave.state, j)
                wave.n_finished += 1

        # a fully-dead wave resets to fresh state before admission: new
        # arrivals then get the fresh-wave cadence (1-step first chunk)
        # and bucket sizing instead of inheriting a stale wave's phase
        if wave.state is not None and not any(s.live for s in wave.slots):
            wave.state = None
            wave.slots = []
            wave.first_chunk = True

        live = [j for j, s in enumerate(wave.slots) if s.live]
        with self._lock:
            n_wait = len(wave.pending)

        # 1. admission
        if wave.state is None:
            if not n_wait:
                return False
            if not self._create_wave_state(wave):
                return False
        else:
            free = [j for j, s in enumerate(wave.slots) if not s.live]
            if n_wait and not free:
                # grow to the next batch bucket that fits live + waiting
                target = self._pick_B(min(len(live) + n_wait,
                                          self.max_batch))
                if target > len(wave.slots):
                    self._resize(wave, target)
                    free = [j for j, s in enumerate(wave.slots) if not s.live]
            jobs: List[Tuple[int, _Request]] = []
            for j in free:
                got = self._take_pending(wave, 1)
                if not got:
                    break
                jobs.append((j, got[0]))
            if jobs:
                self._refill(wave, jobs)

        live = [j for j, s in enumerate(wave.slots) if s.live]
        if not live:
            wave.state = None
            wave.slots = []
            return True

        # 2. compaction: a mostly-dead wave re-packs into the smallest
        #    bucket that fits the survivors (tail requests then decode at
        #    the small-batch kernel rate instead of burning dead slots)
        B = len(wave.slots)
        if len(live) <= B // 2:
            target = self._pick_B(len(live))
            if target < B:
                self._resize(wave, target)
                live = [j for j, s in enumerate(wave.slots) if s.live]
                B = len(wave.slots)

        # 3. sequence-bucket escalation / edge clamp / dead-slot refreeze
        #    (``t2s_model.py:425-428``) — ONE shared definition with
        #    ``generate_batched_stream`` (T2SEngine._prepare_chunk) so the
        #    two stay token-exact and a fix covers both
        n_steps = 1 if wave.first_chunk else eng.check_interval
        wave.first_chunk = False
        wave.state, n_steps, S_cur = eng._prepare_chunk(
            wave.state, [s.live for s in wave.slots], n_steps)

        # 4. one decode chunk for the whole wave
        wave.state, toks = decode_chunk(
            eng.params, cfg, wave.state, n_steps, wave.sa, 0,
            eng._dtype_name(), eng.attn_impl)
        toks = np.asarray(toks)  # [B, n_steps]
        kv = np.asarray(wave.state.kv_len)

        # 5. harvest / emit (same window semantics as
        #    ``generate_batched_stream``: samples[:-1], trimmed at EOS)
        for j in live:
            slot = wave.slots[j]
            slot.harvest.extend(toks[j])
            if slot.handle.cancelled:
                continue  # picked up at the next round's freeze pass
            out = slot.harvest.drain_stream(cfg.eos)
            if out is not None:
                slot.handle._emit(out, False)
            if not eng._retire_after_chunk(int(toks[j][-1]), int(kv[j]),
                                           B, S_cur):
                continue
            slot.handle._emit(slot.harvest.drain_final(cfg.eos), True)
            slot.live = False
            wave.n_finished += 1
            wave.state = self._freeze(wave.state, j)
        return True
