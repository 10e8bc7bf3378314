"""Live transcription service: a production-style front door over the
packed (continuous-batching) scheduler.

The reference's eval loop is offline batch-1 (src/model/cb_whisper.py:212-289);
this wraps :meth:`CBWhisper.forward_packed` in a background worker thread so
callers ``submit()`` utterances at any time and collect transcripts by
ticket — the device runs full-width batches whenever work is queued and
parks (blocking, zero busy-spin) when idle.

Scheduling properties inherited from ``generate_packed``
(decoding/generate.py): finished utterances hand their batch slot to the
next submission, every launch reuses one compiled program family, and
transcripts are schedule-independent (docs/PARITY.md #25) — so a ticket's
text does not depend on what else was in flight.

Threading model: ONE worker thread owns all device work (JAX dispatch stays
single-threaded); ``submit``/``result`` are safe from any thread.  The
in-flight counter decides whether the scheduler's stream blocks on the
queue (idle) or returns "nothing right now" (keep decoding current rows) —
it is only touched on the worker thread, so the decision is exact.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Optional

_CLOSE = object()


class _SwapCmd:
    def __init__(self, params):
        self.params = params


class TranscriptionService:
    """Ticketed transcription over a continuously-batched CBWhisper.

    ``module`` needs ``forward_packed(stream, slots)`` yielding
    ``(order, transcript)`` (orders are 0-based in stream order, which
    matches ticket order — one FIFO queue feeds the scheduler).
    """

    def __init__(self, module, slots: int = 4):
        self._module = module
        self._slots = int(slots)
        self._queue: "queue.Queue[Any]" = queue.Queue()
        self._cv = threading.Condition()
        self._results: Dict[int, str] = {}
        self._error: Optional[BaseException] = None
        self._finished = False
        self._closed = False
        self._next_ticket = 0
        self._inflight = 0  # admitted to the scheduler, result not yet posted
        self._n_mels = int(module.whisper_config.num_mel_bins)
        self._worker = threading.Thread(
            target=self._run, name="ecw-serving", daemon=True
        )
        self._worker.start()

    # ------------------------------------------------------------- client API

    def submit(self, features, attention_mask=None) -> int:
        """Queue one utterance ([1, n_mels, T] or [n_mels, T] log-mel);
        returns the ticket to pass to :meth:`result`."""
        import numpy as np

        features = np.asarray(features, np.float32)
        if features.ndim == 2:
            features = features[None]
        if features.ndim != 3 or features.shape[1] != self._n_mels:
            raise ValueError(
                f"features must be [1, {self._n_mels}, T] log-mel; "
                f"got shape {features.shape}"
            )
        with self._cv:
            if self._closed:
                raise RuntimeError("TranscriptionService is closed")
            if self._error is not None:
                raise RuntimeError("serving worker died") from self._error
            ticket = self._next_ticket
            self._next_ticket += 1
            # enqueue UNDER the lock: ticket order must equal queue order
            # (the scheduler numbers results by stream position), and a
            # ticket issued before close() must land ahead of the sentinel
            self._queue.put((features, attention_mask))
        return ticket

    def result(self, ticket: int, timeout: Optional[float] = None) -> str:
        """Block until ``ticket``'s transcript is ready and return it.
        One-shot: the transcript is evicted on read (a long-running service
        must not accumulate every transcript it ever produced)."""
        with self._cv:
            ok = self._cv.wait_for(
                lambda: ticket in self._results
                or self._error is not None
                or (self._finished and ticket not in self._results),
                timeout,
            )
            if ticket in self._results:
                return self._results.pop(ticket)
            if self._error is not None:
                raise RuntimeError("serving worker died") from self._error
            if not ok:
                raise TimeoutError(f"ticket {ticket} not ready within {timeout}s")
            raise RuntimeError(
                f"service finished without producing ticket {ticket}"
            )

    def swap_params(self, params) -> None:
        """Hot checkpoint rollout into the LIVE service: queued like a
        submission and executed on the worker thread as an epoch barrier —
        the scheduler first drains every utterance already in flight or
        queued ahead (no transcript mixes checkpoints), then calls
        ``generator.swap_params`` (zero recompiles), then admits the work
        queued behind it under the new weights.  An architecture mismatch
        kills the worker like any decode error (surfaced via result())."""
        with self._cv:
            if self._closed:
                raise RuntimeError("TranscriptionService is closed")
            if self._error is not None:
                raise RuntimeError("serving worker died") from self._error
            self._queue.put(_SwapCmd(params))

    def close(self, wait: bool = True) -> None:
        """Stop accepting work; the scheduler drains everything already
        submitted.  With ``wait`` (default) blocks until the drain ends."""
        with self._cv:
            if self._closed:
                if wait:
                    self._worker.join()
                return
            self._closed = True
            self._queue.put(_CLOSE)
        if wait:
            self._worker.join()
            with self._cv:
                if self._error is not None:
                    raise RuntimeError("serving worker died") from self._error

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close(wait=exc[0] is None)

    # ---------------------------------------------------------------- worker

    def _stream(self):
        pending_swap = None
        while True:
            if pending_swap is not None:
                if self._inflight > 0:
                    # epoch barrier: stop admitting, let in-flight work
                    # drain under the OLD weights
                    yield None
                    continue
                self._module.generator.swap_params(pending_swap)
                pending_swap = None
            # exact (worker-thread-only) idle test: block on the queue only
            # when the scheduler holds no rows — otherwise return None so
            # in-flight utterances keep decoding instead of stalling on
            # future work (generate_packed live-serving protocol)
            block = self._inflight == 0
            try:
                item = self._queue.get(block=block)
            except queue.Empty:
                yield None
                continue
            if item is _CLOSE:
                return
            if isinstance(item, _SwapCmd):
                pending_swap = item.params
                continue
            self._inflight += 1
            yield item

    def _run(self):
        try:
            for order, text in self._module.forward_packed(
                self._stream(), slots=self._slots
            ):
                with self._cv:
                    self._results[order] = text
                    self._inflight -= 1
                    self._cv.notify_all()
        except BaseException as e:  # surfaced via result()/submit()/close()
            with self._cv:
                self._error = e
                self._cv.notify_all()
        finally:
            with self._cv:
                self._finished = True
                self._cv.notify_all()
