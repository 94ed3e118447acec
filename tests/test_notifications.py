"""NotificationCenter (app/notifications.py): the engine-honest popup
queue — thread-safe ordered push/drain with the three-part error shape."""

import threading

from nodey_tpu.app.notifications import NotificationCenter
from nodey_tpu.core.errors import ProcessorRuntimeError


def test_push_drain_order():
    nc = NotificationCenter()
    nc.push("info", "a")
    nc.push("warning", "b")
    nc.push("error", "c", "why", "where")
    items = nc.drain()
    assert [n.message for n in items] == ["a", "b", "c"]
    assert [n.severity for n in items] == ["info", "warning", "error"]
    assert items[2].explanation == "why" and items[2].detail == "where"
    assert nc.drain() == []


def test_three_part_error_unwrap():
    nc = NotificationCenter()
    nc.push_error(
        ProcessorRuntimeError("Failed to open input file",
                              "check the path", "File path: x.wav")
    )
    nc.push_error(ValueError("boom"))
    a, b = nc.drain()
    assert a.message == "Failed to open input file"
    assert a.explanation == "check the path"
    assert a.detail == "File path: x.wav"
    assert b.message == "Unexpected error" and b.detail == "ValueError"


def test_cross_thread_push_and_capacity():
    nc = NotificationCenter(capacity=50)

    def worker(tag):
        for i in range(40):
            nc.push("info", f"{tag}-{i}")

    threads = [threading.Thread(target=worker, args=(t,)) for t in "xy"]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    items = nc.drain()
    assert len(items) == 50            # capped
    assert nc.dropped == 30
    seqs = [n.seq for n in items]
    assert seqs == sorted(seqs)        # arrival order preserved


def test_peek_and_listeners():
    nc = NotificationCenter()
    seen = []
    nc.add_listener(lambda n: seen.append(n.message))
    nc.push("info", "hello")
    assert seen == ["hello"]
    assert [n.message for n in nc.peek()] == ["hello"]
    assert len(nc) == 1                # peek does not consume
    first_seq = nc.peek()[0].seq
    nc.push("info", "again")
    assert [n.message for n in nc.peek(since_seq=first_seq)] == ["again"]
