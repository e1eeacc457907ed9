"""TrainProgress epoch/iteration bookkeeping vs the reference's
IterationCounter (util/iter_counter.py): modulo-window events, iter.txt
resume, and the mid-epoch-resume split (epoch_iter restarts at 0 while
total_steps_so_far keeps the into-epoch offset, iter_counter.py:29-47)."""

import os

from cocosnet_tpu.config import test_defaults
from cocosnet_tpu.utils.iter_counter import TrainProgress


def _opt(tmp, **kw):
    kw.setdefault("isTrain", True)
    kw.setdefault("batchSize", 4)
    kw.setdefault("niter", 2)
    kw.setdefault("niter_decay", 2)
    kw.setdefault("checkpoints_dir", str(tmp))
    kw.setdefault("name", "prog")
    return test_defaults(**kw)


def test_event_windows_match_reference_modulo(tmp_path):
    # reference: needs_saving() == total % freq < batchSize
    opt = _opt(tmp_path, print_freq=12, save_latest_freq=20, display_freq=8)
    p = TrainProgress(opt, images_per_epoch=40)
    prints, saves = [], []
    for epoch in p.epochs():
        p.begin_epoch(epoch)
        for _ in range(10):  # 40 images / batch 4
            ev = p.step()
            if ev.print_losses:
                prints.append(p.images_seen)
            if ev.save_latest:
                saves.append(p.images_seen)
        p.end_epoch(verbose=False)
    ref_prints = [n for n in range(4, 161, 4) if n % 12 < 4]
    ref_saves = [n for n in range(4, 161, 4) if n % 20 < 4]
    assert prints == ref_prints
    assert saves == ref_saves


def test_mid_epoch_resume_counters(tmp_path):
    opt = _opt(tmp_path)
    os.makedirs(tmp_path / "prog", exist_ok=True)
    p = TrainProgress(opt, images_per_epoch=64)
    p.begin_epoch(1)
    for _ in range(8):
        p.step()
    assert p.epoch_iter == 32 and p.images_seen == 32
    p.save_record()  # iter.txt: epoch 1, 32 images in

    opt2 = _opt(tmp_path, continue_train=True)
    q = TrainProgress(opt2, images_per_epoch=64)
    assert q.start_epoch == 1
    # total keeps the offset (reference total_steps_so_far includes it) ...
    assert q.images_seen == 32
    q.begin_epoch(1)
    # ... while epoch_iter restarts at 0 (reference record_epoch_start)
    assert q.epoch_iter == 0
    assert q.images_seen == 32
    q.step()
    assert q.epoch_iter == 4 and q.images_seen == 36


def test_epoch_end_record_resumes_next_epoch(tmp_path):
    opt = _opt(tmp_path, save_epoch_freq=1)
    os.makedirs(tmp_path / "prog", exist_ok=True)
    p = TrainProgress(opt, images_per_epoch=8)
    p.begin_epoch(1)
    p.step()
    p.step()
    p.end_epoch(verbose=True)  # writes (2, 0)

    q = TrainProgress(_opt(tmp_path, continue_train=True), images_per_epoch=8)
    assert q.start_epoch == 2
    assert q.images_seen == 8
    q.begin_epoch(2)
    assert q.epoch_iter == 0
