"""kNN classifier vs a brute-force numpy recomputation of the reference's
temperature-weighted voting (engine_finetune.py:216-257)."""
import numpy as np

from ep_tpu.train.engine import knn_classifier


def _brute_force_knn(train_f, train_y, test_f, test_y, k, T, num_classes):
    sim = test_f @ train_f.T
    top1 = top5 = 0
    for i in range(len(test_y)):
        idx = np.argsort(-sim[i])[:k]
        w = np.exp(sim[i, idx] / T)
        probs = np.zeros(num_classes)
        for j, n in enumerate(idx):
            probs[train_y[n]] += w[j]
        order = np.argsort(-probs)
        top1 += int(order[0] == test_y[i])
        top5 += int(test_y[i] in order[:5])
    return top1 * 100.0 / len(test_y), top5 * 100.0 / len(test_y)


def test_knn_matches_brute_force():
    rng = np.random.default_rng(0)
    C, D = 7, 16
    centers = rng.normal(size=(C, D)) * 3
    train_y = np.repeat(np.arange(C), 30)
    test_y = np.repeat(np.arange(C), 5)
    train_f = centers[train_y] + rng.normal(size=(len(train_y), D))
    test_f = centers[test_y] + rng.normal(size=(len(test_y), D))
    train_f /= np.linalg.norm(train_f, axis=1, keepdims=True)
    test_f /= np.linalg.norm(test_f, axis=1, keepdims=True)

    for k in (5, 20):
        got1, got5 = knn_classifier(train_f, train_y, test_f, test_y, k,
                                    T=0.07, num_classes=C, num_chunks=4)
        want1, want5 = _brute_force_knn(train_f, train_y, test_f, test_y, k,
                                        T=0.07, num_classes=C)
        assert abs(got1 - want1) < 1e-6, (k, got1, want1)
        assert abs(got5 - want5) < 1e-6, (k, got5, want5)
    # well-separated clusters ⇒ high accuracy
    assert got1 > 80.0


def test_knn_multi_k_single_pass_matches_per_k():
    """knn_classifier_multi votes per k from ONE top-max(k) device pass
    (the CLI sweep path); must equal the per-k classifier exactly."""
    from ep_tpu.train.engine import knn_classifier_multi

    rng = np.random.default_rng(1)
    C, D = 5, 12
    centers = rng.normal(size=(C, D)) * 3
    train_y = np.repeat(np.arange(C), 40)
    test_y = np.repeat(np.arange(C), 6)
    train_f = centers[train_y] + rng.normal(size=(len(train_y), D))
    test_f = centers[test_y] + rng.normal(size=(len(test_y), D))
    train_f /= np.linalg.norm(train_f, axis=1, keepdims=True)
    test_f /= np.linalg.norm(test_f, axis=1, keepdims=True)

    ks = [5, 10, 50]
    multi = knn_classifier_multi(train_f, train_y, test_f, test_y, ks,
                                 T=0.07, num_classes=C, num_chunks=4)
    for k in ks:
        single = knn_classifier(train_f, train_y, test_f, test_y, k,
                                T=0.07, num_classes=C, num_chunks=4)
        assert multi[k] == single, (k, multi[k], single)
        brute = _brute_force_knn(train_f, train_y, test_f, test_y, k,
                                 T=0.07, num_classes=C)
        assert abs(multi[k][0] - brute[0]) < 1e-6
        assert abs(multi[k][1] - brute[1]) < 1e-6
