"""DataLoader determinism and resumable cursor."""

import numpy as np

from upflow_pytorch_tpu.data.pipeline import DataLoader


class ToyDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return {"x": np.full((2, 2), float(i), np.float32)}


def take(loader, n):
    it = iter(loader)
    out = []
    for _ in range(n):
        out.append(np.asarray(next(it)["x"])[:, 0, 0].tolist())
    loader.close()
    return out


def test_same_seed_same_order():
    a = take(DataLoader(ToyDataset(), 2, seed=5, num_workers=1,
                        device=None, post_fn=lambda b: b), 5)
    b = take(DataLoader(ToyDataset(), 2, seed=5, num_workers=1,
                        device=None, post_fn=lambda b: b), 5)
    assert a == b


def test_different_seed_different_order():
    a = take(DataLoader(ToyDataset(), 2, seed=1, num_workers=1,
                        post_fn=lambda b: b), 5)
    b = take(DataLoader(ToyDataset(), 2, seed=2, num_workers=1,
                        post_fn=lambda b: b), 5)
    assert a != b


def test_resume_from_cursor_continues_epoch():
    full = take(DataLoader(ToyDataset(), 2, seed=3, num_workers=1,
                           post_fn=lambda b: b), 5)
    # consume 2 batches, record cursor, rebuild, get the remaining 3
    l1 = DataLoader(ToyDataset(), 2, seed=3, num_workers=1,
                    post_fn=lambda b: b, prefetch=1)
    it = iter(l1)
    next(it)
    # the producer may have prefetched ahead; read the logical cursor as
    # consumed-count instead for this test
    next(it)
    l1.close()
    l2 = DataLoader(ToyDataset(), 2, seed=3, num_workers=1,
                    post_fn=lambda b: b, epoch=0, position=2)
    rest = take(l2, 3)
    assert rest == full[2:]


def test_epoch_reshuffles():
    # across epochs the order differs (epoch folded into the rng)
    batches = take(DataLoader(ToyDataset(), 2, seed=7, num_workers=1,
                              post_fn=lambda b: b), 10)
    assert batches[:5] != batches[5:]
    # but every item appears exactly once per epoch
    flat = sorted(x for b in batches[:5] for x in b)
    assert flat == sorted(float(i) for i in range(10))
