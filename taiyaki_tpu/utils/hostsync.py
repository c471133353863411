"""Cross-host scalar max-reduction over a plain TCP channel.

Multihost seqlen bucketing needs every host to agree on the padded
sequence length of each sub-batch (taiyaki_tpu/train.py:bucket_seqlen);
hosts disagreeing on shapes would crash or deadlock the gradient psum.
The reduction runs on each host's prefetch/sampler thread, so it must
NOT be a device collective: interleaving sampler-thread collectives with
the main thread's train-step psums in different orders on different
hosts deadlocks the ICI/DCN launch streams.  (The reference sizes its DP
buffers to the true batch max locally every iteration —
/root/reference/taiyaki/ctc/ctc.pyx:126-134 — which is free on CPU but
is a compile per shape on TPU and never has to agree across ranks.)

This module provides that host-side channel with nothing but the
standard library: the lead process hosts a tiny request/reply server on
an ephemeral port (announced once at startup through the public
`jax.experimental.multihost_utils.broadcast_one_to_all`, on the main
thread, before any other collective is in flight); every process —
including the lead — holds one persistent client connection.  Earlier
revisions used the JAX coordination-service key-value store, but that
client is only reachable through the private `jax._src.distributed`
module, one upgrade away from breaking.

Wire protocol (newline-delimited text, one in-flight request per
connection, serialized by a client-side lock):

    client -> server:  "<tag> <value>\n"
    server -> client:  "<tag> <max over all n submissions>\n"
    server -> client:  "! peer-lost\n"   (a participant died: fail fast)

Tags must be issued in the same ORDER on every host (the trainer uses
"iteration.sub_batch"), but requests for a tag may arrive at the server
in any host order; the server replies to all n connections once the
n-th value for that tag lands and then forgets the tag, so state never
accumulates.
"""

import os
import socket
import threading


class MaxReduceServer:
    """Lead-process reduction server for `n_procs` participants.

    Construct with the number of participating processes; `port` is the
    ephemeral port actually bound (advertise it to the other hosts).
    The accept loop and per-connection readers are daemon threads, so an
    un-`close()`d server never blocks interpreter exit.
    """

    def __init__(self, n_procs, host=""):
        self.n_procs = n_procs
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, 0))
        self._sock.listen(n_procs)
        self.port = self._sock.getsockname()[1]
        self._lock = threading.Lock()
        # Per-connection write locks: reply fan-out and the peer-lost
        # sentinel run on different threads, and interleaved writes to
        # ONE client socket could corrupt the newline framing.  A single
        # global lock would also work but adds cross-host head-of-line
        # blocking (a stalled peer's full socket buffer would block
        # sends to every healthy host, including the fail-fast path).
        self._send_locks = {}   # conn -> threading.Lock
        self._pending = {}      # tag -> list of (value, conn)
        self._conns = []
        self._closing = False
        self._dead = False      # a participant was lost; job is over
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def _accept_loop(self):
        for _ in range(self.n_procs):
            try:
                conn, _ = self._sock.accept()
            except OSError:     # closed mid-accept
                return
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            with self._lock:
                self._conns.append(conn)
                self._send_locks[conn] = threading.Lock()
            threading.Thread(target=self._serve_conn, args=(conn,),
                             daemon=True).start()

    def _serve_conn(self, conn):
        buf = b""
        while True:
            try:
                data = conn.recv(4096)
            except OSError:
                return self._peer_lost()
            if not data:
                return self._peer_lost()
            buf += data
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                tag, value = line.decode().rsplit(" ", 1)
                self._submit(tag, int(value), conn)

    def _peer_lost(self):
        """A participant's connection dropped mid-job: every reduction
        from now on would wait for a submission that can never come, so
        FAIL FAST — broadcast a sentinel reply that makes any blocked
        (or future) `reduce()` raise immediately instead of sitting out
        the full socket timeout.  Suppressed during `close()` (normal
        shutdown tears connections down in arbitrary host order; with
        collective tags a straggler EOF can only break a tag that could
        never complete anyway, and an unread sentinel in a finished
        client's buffer is harmless)."""
        with self._lock:
            if self._closing:
                return
            self._dead = True
            conns = list(self._conns)
        for c in conns:
            self._send(c, b"! peer-lost\n")

    def _send(self, conn, data):
        """sendall under the connection's own write lock (framing safety
        without cross-connection head-of-line blocking); OSError means a
        dead peer, which surfaces on its own recv."""
        lock = self._send_locks.get(conn)
        try:
            if lock is None:
                conn.sendall(data)
            else:
                with lock:
                    conn.sendall(data)
        except OSError:
            pass

    def _submit(self, tag, value, conn):
        with self._lock:
            dead = self._dead
            if not dead:
                entries = self._pending.setdefault(tag, [])
                entries.append((value, conn))
                if len(entries) < self.n_procs:
                    return
                del self._pending[tag]
        if dead:
            # job already failed: bounce every late submission so no
            # host ever waits out a socket timeout
            self._send(conn, b"! peer-lost\n")
            return
        reply = "{} {}\n".format(tag, max(v for v, _ in entries)).encode()
        for _, c in entries:
            self._send(c, reply)

    def close(self):
        """Close the listener AND all accepted connections, so blocked
        clients error out instead of hanging."""
        try:
            self._sock.close()
        except OSError:
            pass
        with self._lock:
            self._closing = True
            conns, self._conns = self._conns, []
        for c in conns:
            try:
                # shutdown first: close() alone does not send FIN while
                # the reader thread is still blocked in recv on the fd
                c.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            try:
                c.close()
            except OSError:
                pass


class MaxReducer:
    """Per-process client: `reduce(tag, value)` -> global max.

    Thread-safe (an internal lock serializes requests on the single
    connection); any thread may call it, which is the point — the
    trainer calls from its prefetch worker.
    """

    def __init__(self, host, port, timeout=120.0):
        self._conn = socket.create_connection((host, port), timeout=timeout)
        self._conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._lock = threading.Lock()
        self._buf = b""
        self._poisoned = None   # RuntimeError once a peer-lost is seen

    def reduce(self, tag, value):
        assert " " not in tag and "\n" not in tag, tag
        with self._lock:
            if self._poisoned is not None:
                raise self._poisoned
            self._conn.sendall("{} {}\n".format(tag, int(value)).encode())
            while b"\n" not in self._buf:
                data = self._conn.recv(4096)
                if not data:
                    raise RuntimeError(
                        "seqlen-sync server closed the connection")
                self._buf += data
            line, self._buf = self._buf.split(b"\n", 1)
            rtag, rvalue = line.decode().rsplit(" ", 1)
            if rtag == "!":
                self._poisoned = RuntimeError(
                    "seqlen-sync: a peer host's connection was lost "
                    "({}) — the multihost job cannot continue; "
                    "restart all hosts".format(rvalue))
                raise self._poisoned
            if rtag != tag:
                # one-in-flight per connection + same tag order on every
                # host makes this unreachable; fail loudly if violated
                raise RuntimeError(
                    "seqlen-sync reply tag mismatch: sent %r, got %r"
                    % (tag, rtag))
            return int(rvalue)

    def close(self):
        try:
            self._conn.close()
        except OSError:
            pass


def start(timeout=120.0):
    """Set up the cross-host max-reducer for the current JAX job.

    The lead process binds the server on an ephemeral port; port and
    lead hostname are broadcast to all processes with public-API device
    collectives on the calling (main) thread — after this returns,
    `reduce()` never touches a device again.  Returns
    (reducer, server); server is None on non-lead processes (keep a
    reference on the lead and `close()` both at shutdown).  Requires
    jax.distributed to be initialized.
    """
    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    server = None
    port = 0
    if jax.process_index() == 0:
        server = MaxReduceServer(jax.process_count())
        port = server.port
    port = int(multihost_utils.broadcast_one_to_all(
        np.asarray(port, np.int32)))
    name = np.frombuffer(
        socket.gethostname()[:64].ljust(64).encode(), np.uint8)
    lead_name = bytes(np.asarray(
        multihost_utils.broadcast_one_to_all(name))).decode().strip()
    if jax.process_index() == 0:
        host = "127.0.0.1"
    else:
        # Prefer the explicit rendezvous address (known-routable from
        # this host) over the lead's hostname (which may not resolve
        # off-host, e.g. "localhost" in single-machine tests).
        coord = os.environ.get("TAIYAKI_COORDINATOR", "")
        host = coord.rsplit(":", 1)[0] if coord else lead_name
    reducer = MaxReducer(host, port, timeout=timeout)
    return reducer, server
