"""Object-store-safe commit protocol (connectors_spark/commitfs.py):
atomic blob puts, the immutable sequence-numbered commit log, CAS
winner election under races and injected crashes — run against BOTH
the real local filesystem (pyarrow LocalFileSystem, rename path) and
the in-memory object-store double (no rename, PUT-at-close path).
VERDICT r4 next-round items #1 and #7."""

import json
import os
import threading

import pytest

from connectors_spark import commitfs
from connectors_spark.commitfs import (
    log_entry_at,
    InMemoryObjectStore,
    _CrashBeforePut,
    atomic_put,
    force_commit,
    gc_log,
    get_bytes,
    get_json,
    log_commit,
    log_head,
    put_json_atomic,
)


def _fixtures(tmp_path):
    """(fs, store_path) pairs: local FS and the object-store double."""
    local_store = str(tmp_path / "local_store")
    os.makedirs(local_store, exist_ok=True)
    return [(commitfs.local_fs(), local_store),
            (InMemoryObjectStore(), "mem://bucket/store")]


# ---------------------------------------------------------------- puts

def test_atomic_put_roundtrip_both_filesystems(tmp_path):
    for fs, store in _fixtures(tmp_path):
        p = f"{store}/meta.json"
        atomic_put(fs, p, b'{"v": 1}')
        assert get_bytes(fs, p) == b'{"v": 1}'
        atomic_put(fs, p, b'{"v": 2}')  # overwrite commits atomically
        assert get_json(p, fs=fs) == {"v": 2}
        assert get_bytes(fs, f"{store}/absent.json") is None


def test_local_put_leaves_no_tmp_litter(tmp_path):
    fs, store = _fixtures(tmp_path)[0]
    put_json_atomic(f"{store}/meta.json", {"a": 1}, fs=fs)
    assert sorted(os.listdir(store)) == ["meta.json"]


def test_crashed_put_never_becomes_visible():
    """The S3 crash model: a writer that dies before its PUT lands
    leaves the OLD blob fully intact — readers never see a torn or
    half-new object."""
    fs = InMemoryObjectStore()
    p = "mem://b/meta.json"
    atomic_put(fs, p, b"old")
    fs.fail_puts_matching("meta.json", times=1)
    with pytest.raises(_CrashBeforePut):
        atomic_put(fs, p, b"new")
    assert get_bytes(fs, p) == b"old"
    atomic_put(fs, p, b"new")  # retry after the fault drains
    assert get_bytes(fs, p) == b"new"


def test_inmemory_store_has_no_rename():
    fs = InMemoryObjectStore()
    atomic_put(fs, "mem://b/x", b"1")
    with pytest.raises(NotImplementedError):
        fs.move("mem://b/x", "mem://b/y")


# ----------------------------------------------------------- the log

def test_log_advances_and_head_reads_latest(tmp_path):
    for fs, store in _fixtures(tmp_path):
        assert log_head(fs, store) == (0, None)
        assert log_commit(fs, store, 0, {"gen": "g1"}, writer_id="w1")
        assert log_head(fs, store) == (1, {"gen": "g1"})
        assert log_commit(fs, store, 1, {"gen": "g2"}, writer_id="w1")
        assert log_head(fs, store) == (2, {"gen": "g2"})


def test_stale_cas_fails_without_writing(tmp_path):
    for fs, store in _fixtures(tmp_path):
        assert log_commit(fs, store, 0, {"gen": "g1"}, writer_id="w1")
        # expected_seq=0 is stale now: rejected, head untouched
        assert not log_commit(fs, store, 0, {"gen": "gX"}, writer_id="w2")
        assert log_head(fs, store) == (1, {"gen": "g1"})


def test_same_seq_race_exactly_one_winner_loser_retires(tmp_path):
    """Both writers PUT their seq-1 entry before either verifies (the
    worst interleaving): election is a pure function of the entry set,
    so both agree on the winner; the loser deletes its entry."""
    for fs, store in _fixtures(tmp_path):
        cdir = os.path.join(store, commitfs.COMMITS_DIR)
        # simulate the interleaved double-PUT directly
        atomic_put(fs, os.path.join(cdir, commitfs._entry_name(1, "bbb")),
                   json.dumps({"gen": "B"}).encode())
        atomic_put(fs, os.path.join(cdir, commitfs._entry_name(1, "aaa")),
                   json.dumps({"gen": "A"}).encode())
        # every reader elects the same head: min writer_id at max seq
        assert log_head(fs, store) == (1, {"gen": "A"})
        # writer bbb's verify step (as log_commit would run it) loses
        head = commitfs._elect(commitfs._log_entries(fs, store))
        assert head == (1, "aaa")


def test_threaded_cas_race_reader_consistent(tmp_path):
    """8 writers race the same expected seq. The guarantee the portable
    (no-conditional-put) protocol ACTUALLY makes — see the
    log_commit docstring — is reader-side: after the dust settles,
    log_head elects exactly one deterministic winner, that winner's
    writer reported success, and every False-reporting writer retired
    its entry. (Writer acks can rarely double-report True inside the
    documented steal window — pinned deterministically in
    test_steal_window_reader_converges — so this asserts the reader
    invariant, not sum(acks)==1.)"""
    for fs, store in _fixtures(tmp_path):
        results = {}
        barrier = threading.Barrier(8)

        def contender(i):
            barrier.wait()
            results[i] = log_commit(fs, store, 0, {"gen": f"g{i}"},
                                    writer_id=f"w{i:02d}")

        threads = [threading.Thread(target=contender, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sum(results.values()) >= 1, results
        seq, payload = log_head(fs, store)
        assert seq == 1
        # the deterministic head belongs to a writer that reported True
        head_writer = int(payload["gen"][1:])
        assert results[head_writer] is True
        # every surviving entry belongs to a True-reporting writer
        # (False-reporters retired), and the head is their min id
        left = commitfs._log_entries(fs, store)
        assert all(results[int(w[1:])] for _, w in left)
        assert payload == {"gen": f"g{min(int(w[1:]) for _, w in left)}"}


def test_steal_window_reader_converges():
    """The documented portable-CAS acknowledgment window, pinned
    deterministically: writer A elects itself and returns True; a
    smaller-id writer B lands afterwards at the SAME seq and also wins
    its own verify. Readers never see two winners — log_head
    deterministically elects B — and delta.try_promote (which re-reads
    the head after committing) reports the reader-consistent answer."""
    fs = InMemoryObjectStore()
    store = "mem://b/s"
    assert log_commit(fs, store, 0, {"gen": "A"}, writer_id="bbb")
    # B raced from the same expected seq: its stale-check LIST ran
    # BEFORE A's put (simulated by replaying B's post-check steps), so
    # its entry lands at the same seq with a smaller id...
    cdir = os.path.join(store, commitfs.COMMITS_DIR)
    commitfs.atomic_put(fs, os.path.join(cdir, commitfs._entry_name(1, "aaa")),
                        json.dumps({"gen": "B"}).encode())
    # ...and B's verify would elect itself — a second True ack
    assert commitfs._elect(commitfs._log_entries(fs, store)) == (1, "aaa")
    # yet every reader resolves exactly one head: B, deterministically
    assert log_head(fs, store) == (1, {"gen": "B"})
    # and the next CAS builds on the reader-visible truth
    assert not log_commit(fs, store, 0, {"gen": "C"}, writer_id="ccc")
    assert log_commit(fs, store, 1, {"gen": "C"}, writer_id="ccc")
    assert log_head(fs, store) == (2, {"gen": "C"})


def test_crash_before_entry_put_leaves_head_unchanged():
    fs = InMemoryObjectStore()
    assert log_commit(fs, "s", 0, {"gen": "g1"}, writer_id="w1")
    fs.fail_puts_matching(commitfs.COMMITS_DIR, times=1)
    with pytest.raises(_CrashBeforePut):
        log_commit(fs, "s", 1, {"gen": "g2"}, writer_id="w2")
    assert log_head(fs, "s") == (1, {"gen": "g1"})
    # the crashed writer's retry (fresh attempt id) succeeds
    assert log_commit(fs, "s", 1, {"gen": "g2"}, writer_id="w2-retry")
    assert log_head(fs, "s") == (2, {"gen": "g2"})


def test_crashed_winner_entry_is_the_head():
    """A writer that dies AFTER its entry PUT but before verifying has
    still committed — its payload was durable first (ordering
    contract), so readers electing it is correct, not a torn state."""
    fs = InMemoryObjectStore()
    cdir = os.path.join("s", commitfs.COMMITS_DIR)
    atomic_put(fs, os.path.join(cdir, commitfs._entry_name(1, "dead")),
               json.dumps({"gen": "g1"}).encode())
    assert log_head(fs, "s") == (1, {"gen": "g1"})
    # the next writer CASes on top of it normally
    assert log_commit(fs, "s", 1, {"gen": "g2"}, writer_id="w2")
    assert log_head(fs, "s") == (2, {"gen": "g2"})


def test_conditional_put_backend_strict_cas():
    """On a backend with native create-if-absent (S3 If-None-Match /
    GCS if-generation-match), log_commit routes through ONE atomic
    put_if_absent per seq — writer acks are strictly exactly-one, the
    portable path's acknowledgment window does not exist."""
    fs = InMemoryObjectStore(conditional_put=True)
    store = "mem://b/s"
    results = {}
    barrier = threading.Barrier(8)

    def contender(i):
        barrier.wait()
        results[i] = log_commit(fs, store, 0, {"gen": f"g{i}"},
                                writer_id=f"w{i:02d}")

    threads = [threading.Thread(target=contender, args=(i,))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sum(results.values()) == 1, results
    winner = next(i for i, won in results.items() if won)
    assert log_head(fs, store) == (1, {"gen": f"g{winner}"})
    # and the log keeps advancing via the same strict path
    assert log_commit(fs, store, 1, {"gen": "g9"}, writer_id="w09")
    assert not log_commit(fs, store, 1, {"gen": "gX"}, writer_id="w10")
    assert log_head(fs, store) == (2, {"gen": "g9"})


def test_log_entry_at_time_travel(tmp_path):
    for fs, store in _fixtures(tmp_path):
        for i in range(5):
            assert log_commit(fs, store, i, {"gen": f"g{i + 1}"},
                              writer_id="w")
        assert log_head(fs, store) == (5, {"gen": "g5"})
        assert log_entry_at(fs, store, 3) == {"gen": "g3"}
        assert log_entry_at(fs, store, 99) is None
        # gc keeps a window; inside it time travel still resolves
        gc_log(fs, store, keep=2)
        assert log_entry_at(fs, store, 2) is None
        assert log_entry_at(fs, store, 4) == {"gen": "g4"}


def test_force_commit_retries_past_interleaved_writer(tmp_path):
    for fs, store in _fixtures(tmp_path):
        force_commit(fs, store, {"gen": "g1"}, writer_id="w1")
        seq = force_commit(fs, store, {"gen": "g2"}, writer_id="w2")
        assert seq == 2 and log_head(fs, store)[1] == {"gen": "g2"}


def test_gc_log_keeps_recent_window(tmp_path):
    for fs, store in _fixtures(tmp_path):
        for i in range(12):
            assert log_commit(fs, store, i, {"gen": f"g{i + 1}"},
                              writer_id="w")
        removed = gc_log(fs, store, keep=3)
        assert len(removed) == 9
        left = sorted(s for s, _ in commitfs._log_entries(fs, store))
        assert left == [10, 11, 12]
        assert log_head(fs, store) == (12, {"gen": "g12"})


# ------------------------------------------- round-5 hardening fixes

class _SuccessorInjectingStore(InMemoryObjectStore):
    """After the writer's own entry lands, every subsequent LIST first
    materializes a successor commit at seq+1 — modeling another writer
    that read OUR entry as head and chained on it inside the confirm
    window."""

    def __init__(self):
        super().__init__()
        self._armed = False

    def list_dir(self, dirpath):
        out = super().list_dir(dirpath)
        # chain only once OUR predecessor's entry is visible (a real
        # successor reads head seq=1 before committing at seq=2)
        if (self._armed
                and any(n.startswith("00000000000000000001")
                        for n, _ in out)
                and not any(n.startswith("00000000000000000002")
                            for n, _ in out)):
            succ = dirpath.rstrip("/") + "/00000000000000000002.zzzz.json"
            with self._lock:
                self._blobs[succ] = b'{"gen": "chained-on-seq1"}'
            out = super().list_dir(dirpath)
        return out


def test_winner_survives_successor_commit_in_confirm_window():
    """A successor landing at seq+1 during the confirm window chained on
    THIS writer's entry as head — the writer must still report a win and
    must NOT delete its entry (time travel + reader lineage depend on
    it). Regression: whole-log election made the winner self-retire."""
    fs = _SuccessorInjectingStore()
    store = "mem://bucket/store"
    fs._armed = True
    assert log_commit(fs, store, 0, {"gen": "mine"}, writer_id="aaaa")
    # the seq-1 entry survives and time travel still resolves it
    assert log_entry_at(fs, store, 1) == {"gen": "mine"}
    # readers follow the successor as head
    seq, payload = log_head(fs, store)
    assert (seq, payload) == (2, {"gen": "chained-on-seq1"})


def test_zero_length_entry_is_never_elected(tmp_path):
    """A torn local rename (power loss on a legacy pre-fsync entry) can
    leave a listable zero-length entry; readers must skip it instead of
    crashing on json.loads(b"") forever."""
    for fs, store in _fixtures(tmp_path):
        assert log_commit(fs, store, 0, {"gen": "good"}, writer_id="aaaa")
        torn = os.path.join(store, commitfs.COMMITS_DIR,
                            "00000000000000000002.dead.json")
        with fs.open_output_stream(torn) as out:
            out.write(b"")
        seq, payload = log_head(fs, store)
        assert (seq, payload) == (1, {"gen": "good"})
        # CAS on top of the surviving head works (torn entry outranked)
        assert log_commit(fs, store, 1, {"gen": "next"}, writer_id="bbbb")
        assert log_head(fs, store) == (2, {"gen": "next"})


def test_corrupt_head_entry_falls_back_to_previous_commit(tmp_path):
    """A non-JSON head blob (corrupt legacy entry) is dropped from the
    election and the previous commit is served instead of an unhandled
    JSONDecodeError in every reader."""
    for fs, store in _fixtures(tmp_path):
        assert log_commit(fs, store, 0, {"gen": "good"}, writer_id="aaaa")
        bad = os.path.join(store, commitfs.COMMITS_DIR,
                           "00000000000000000002.dead.json")
        with fs.open_output_stream(bad) as out:
            out.write(b"\x00not json")
        seq, payload = log_head(fs, store)
        assert (seq, payload) == (1, {"gen": "good"})
