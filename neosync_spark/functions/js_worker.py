"""Persistent Node worker for user-JavaScript transformers.

One long-lived Node child per Python executor process, speaking
line-delimited JSON over stdin/stdout — replaces the round-2
process-per-Arrow-batch design, whose ~10^6 spawns at 10^10 rows /
10k-row batches would dominate the JS cost. Compiled user functions are
cached in the worker by code string, so steady-state per batch is one
JSON round-trip and zero process or compile work.

Protocol: request ``{"id": n, "code": s, "rows": [[v, k], ...],
"nullGuard": b}`` → response ``{"id": n, "out": [...]}`` or
``{"id": n, "err": s}``. A user-code error fails only that request —
the worker survives (that is the amortization). ``console.log`` is
rebound to stderr inside the worker so user code cannot corrupt the
protocol stream.

Reference analog: the goja VM pool in
/root/reference/worker/pkg/benthos/javascript/processor.go (one VM per
pipeline thread, reused across messages).
"""

from __future__ import annotations

import json
import os
import select
import shutil
import subprocess
import tempfile
import threading
import time

_RUNNER = r"""
console.log = console.error;
const readline = require('readline');
const rl = readline.createInterface({input: process.stdin, terminal: false});
const fns = new Map();
rl.on('line', (line) => {
  let req;
  try { req = JSON.parse(line); }
  catch (e) { process.stdout.write(JSON.stringify({id: -1, err: String(e)}) + "\n"); return; }
  try {
    let f = fns.get(req.code);
    if (!f) { f = new Function('value', 'key', req.code); fns.set(req.code, f); }
    const out = req.rows.map(([v, k]) => {
      if (req.nullGuard && v === null) return null;
      const r = f(v, k);
      return r === undefined ? null : r;
    });
    process.stdout.write(JSON.stringify({id: req.id, out: out}) + "\n");
  } catch (e) {
    process.stdout.write(JSON.stringify({id: req.id, err: String(e)}) + "\n");
  }
});
"""


class NodeWorker:
    """Lazy-spawned singleton per Python process (executor workers are
    single-threaded over pandas UDF batches, but evaluation is locked
    for safety). Crashes respawn on the next call."""

    _instance: "NodeWorker | None" = None
    _class_lock = threading.Lock()

    def __init__(self) -> None:
        node = shutil.which("node")
        if node is None:
            raise NotImplementedError(
                "transform_javascript requires a node runtime on the executors"
            )
        self._stderr = tempfile.NamedTemporaryFile(
            prefix="ns_js_worker_", suffix=".err", delete=False
        )
        self.proc = subprocess.Popen(
            [node, "-e", _RUNNER],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=self._stderr,
        )
        self._rbuf = b""
        self._next_id = 0
        self._lock = threading.Lock()

    @classmethod
    def get(cls) -> "NodeWorker":
        with cls._class_lock:
            w = cls._instance
            if w is None or w.proc.poll() is not None:
                if w is not None:
                    w.close()
                w = cls._instance = NodeWorker()
            return w

    def close(self) -> None:
        try:
            self.proc.kill()
            self.proc.wait(timeout=5)
        except Exception:
            pass
        try:
            self._stderr.close()
            os.unlink(self._stderr.name)
        except OSError:
            pass

    def _stderr_tail(self) -> str:
        try:
            with open(self._stderr.name, "rb") as f:
                f.seek(max(0, os.path.getsize(self._stderr.name) - 2000))
                return f.read().decode(errors="replace")
        except OSError:
            return ""

    def _read_line(self, timeout: float) -> bytes:
        fd = self.proc.stdout.fileno()
        deadline = time.monotonic() + timeout
        while b"\n" not in self._rbuf:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                raise TimeoutError("node worker response timed out")
            ready, _, _ = select.select([fd], [], [], remaining)
            if not ready:
                raise TimeoutError("node worker response timed out")
            chunk = os.read(fd, 1 << 20)
            if not chunk:
                raise RuntimeError(
                    f"node worker died: {self._stderr_tail()[:500]}"
                )
            self._rbuf += chunk
        line, self._rbuf = self._rbuf.split(b"\n", 1)
        return line

    def eval(
        self,
        code: str,
        rows: list,
        null_guard: bool,
        timeout: float,
    ) -> list:
        with self._lock:
            self._next_id += 1
            req_id = self._next_id
            payload = json.dumps(
                {"id": req_id, "code": code, "rows": rows, "nullGuard": null_guard},
                ensure_ascii=False,
            ).encode()
            try:
                self.proc.stdin.write(payload + b"\n")
                self.proc.stdin.flush()
                resp = json.loads(self._read_line(timeout))
            except (TimeoutError, RuntimeError, BrokenPipeError, OSError):
                # worker wedged or dead: kill so the next call respawns
                with NodeWorker._class_lock:
                    if NodeWorker._instance is self:
                        NodeWorker._instance = None
                self.close()
                raise
            if resp.get("err") is not None:
                raise RuntimeError(f"user javascript failed: {resp['err'][:500]}")
            if resp.get("id") != req_id:
                raise RuntimeError("node worker protocol desync")
            return resp["out"]
