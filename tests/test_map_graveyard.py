"""Deferred map-point pool reclamation (map.GRAVEYARD_EPOCHS).

Regression for a pool-slot reuse hazard: set_point_bad/replace_point used
to release the slot immediately, so a create_point in the same mapper spin
could re-allocate it (LIFO free list) and overwrite the tombstone while
the tracker's last-frame bindings (or a loop-closing candidate window)
still held the pid — stale holders then resolved to an unrelated live
point, a silent wrong data association."""

import numpy as np

from sp_orb_slam_tpu.slam.map import GRAVEYARD_EPOCHS, Map


def _mk_point(world, kf_id=0):
    return world.create_point(np.zeros(3, np.float32), kf_id)


def test_dead_slot_not_reused_within_quarantine():
    world = Map(mp_capacity=64)
    mp = _mk_point(world)
    pid = mp.pid
    world.set_point_bad(mp)
    # tombstone stays queryable and the slot is NOT immediately reusable
    assert world.points[pid].bad
    fresh = [_mk_point(world).pid for _ in range(8)]
    assert pid not in fresh
    # replaced_by chains survive the quarantine window
    a, b = _mk_point(world), _mk_point(world)
    world.replace_point(a, b)
    got = world.get_point(a.pid)
    assert got is not None and got.pid == b.pid


def test_slot_reclaimed_after_quarantine():
    world = Map(mp_capacity=8)
    mp = _mk_point(world)
    pid = mp.pid
    world.set_point_bad(mp)
    for _ in range(GRAVEYARD_EPOCHS + 1):
        world.advance_epoch()
    # tombstone flushed, slot back in circulation
    assert pid not in world.points
    pids = [_mk_point(world).pid for _ in range(7)]
    assert pid in pids  # capacity 8 forces the reclaimed slot into use


def test_clear_preserves_lock_identity():
    world = Map(mp_capacity=8)
    lock = world.update_lock
    with lock:
        world.clear()
    assert world.update_lock is lock
