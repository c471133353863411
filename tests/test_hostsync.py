"""Unit tests for the cross-host TCP max-reducer (utils/hostsync.py).

The jax-facing `start()` path (ephemeral-port broadcast + rendezvous) is
exercised by tests/test_multihost.py's real 2-process training run; here
the server/client protocol is tested directly — including the
out-of-host-order arrival and threaded-caller cases the trainer relies
on.
"""

import threading

from taiyaki_tpu.utils import hostsync


def _clients(server, n):
    return [hostsync.MaxReducer("127.0.0.1", server.port, timeout=30)
            for _ in range(n)]


def test_two_party_max():
    server = hostsync.MaxReduceServer(2)
    a, b = _clients(server, 2)
    try:
        out = [None, None]
        ta = threading.Thread(target=lambda: out.__setitem__(
            0, a.reduce("0.0", 384)))
        ta.start()
        out[1] = b.reduce("0.0", 512)
        ta.join(timeout=30)
        assert out == [512, 512]
    finally:
        a.close(); b.close(); server.close()


def test_sequence_of_tags_and_state_cleanup():
    server = hostsync.MaxReduceServer(2)
    a, b = _clients(server, 2)
    try:
        results = {}

        def run(client, vals):
            for i, v in enumerate(vals):
                tag = "{}.0".format(i)
                results.setdefault(tag, []).append(
                    client.reduce(tag, v))

        va, vb = [3, 700, 12, 128], [5, 6, 900, 128]
        tb = threading.Thread(target=run, args=(b, vb))
        tb.start()
        run(a, va)
        tb.join(timeout=60)
        assert results == {"0.0": [5, 5], "1.0": [700, 700],
                           "2.0": [900, 900], "3.0": [128, 128]}
        # all tags resolved -> server forgot them
        assert server._pending == {}
    finally:
        a.close(); b.close(); server.close()


def test_many_parties_threaded():
    n = 5
    server = hostsync.MaxReduceServer(n)
    clients = _clients(server, n)
    try:
        outs = [None] * n

        def run(i):
            outs[i] = clients[i].reduce("7.3", 100 + i)

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert outs == [100 + n - 1] * n
    finally:
        for c in clients:
            c.close()
        server.close()


def test_server_close_unblocks_client():
    import time
    server = hostsync.MaxReduceServer(2)
    (a,) = _clients(server, 1)
    try:
        err = []

        def run():
            try:
                a.reduce("0.0", 1)
            except (RuntimeError, OSError) as exc:
                err.append(exc)

        t = threading.Thread(target=run)
        t.start()
        # only 1 of 2 submissions -> reply never comes; closing the
        # server must error the client out rather than hang it
        time.sleep(0.2)
        server.close()
        t.join(timeout=10)
        assert not t.is_alive()
        assert err
    finally:
        a.close(); server.close()


def test_peer_death_fails_survivor_fast():
    """A participant dying mid-job must error the survivor out
    immediately (server broadcasts the peer-lost sentinel), NOT leave it
    hanging until the socket timeout."""
    import time
    server = hostsync.MaxReduceServer(2)
    a, b = _clients(server, 2)
    try:
        err = []

        def run():
            try:
                a.reduce("0.0", 1)
            except RuntimeError as exc:
                err.append(exc)

        t = threading.Thread(target=run)
        t.start()
        time.sleep(0.2)
        b.close()              # peer dies without ever submitting
        t0 = time.monotonic()
        t.join(timeout=10)
        assert not t.is_alive(), "survivor hung after peer death"
        # well under the 30s socket timeout: the sentinel, not the timeout
        assert time.monotonic() - t0 < 5
        assert err and "peer" in str(err[0])
        # and FUTURE reduces fail IMMEDIATELY (poisoned client; no
        # socket-timeout wait)
        t1 = time.monotonic()
        try:
            a.reduce("0.1", 2)
            raised = False
        except RuntimeError:
            raised = True
        assert raised and time.monotonic() - t1 < 1
    finally:
        a.close(); server.close()


def test_peer_death_mid_stream_fails_other_hosts():
    """Peer dies AFTER some successful reductions; remaining hosts must
    raise on their next (already-blocked) reduction."""
    import time
    server = hostsync.MaxReduceServer(3)
    a, b, c = _clients(server, 3)
    try:
        # one full round succeeds
        outs = []
        tb = threading.Thread(target=lambda: outs.append(
            b.reduce("0.0", 7)))
        tc = threading.Thread(target=lambda: outs.append(
            c.reduce("0.0", 9)))
        tb.start(); tc.start()
        outs.append(a.reduce("0.0", 5))
        tb.join(timeout=10); tc.join(timeout=10)
        assert sorted(outs) == [9, 9, 9]

        # next round: c dies while a and b wait
        errs = []

        def run(client):
            try:
                client.reduce("1.0", 1)
            except RuntimeError as exc:
                errs.append(exc)

        ta = threading.Thread(target=run, args=(a,))
        tb = threading.Thread(target=run, args=(b,))
        ta.start(); tb.start()
        time.sleep(0.2)
        c.close()
        ta.join(timeout=10); tb.join(timeout=10)
        assert not ta.is_alive() and not tb.is_alive()
        assert len(errs) == 2
    finally:
        a.close(); b.close(); server.close()
