"""Fixed-shape NMS vs the reference's greedy loop semantics."""

import jax.numpy as jnp
import numpy as np

from room_slam_tpu.ops.nms import nms_3d_mask, post_process


def _greedy_reference(boxes, scores, iou_threshold):
    """Direct numpy restatement of greedy 3D NMS
    (ref: src/benchmark/inference.py:87-127)."""

    def iou(b1, b2):
        mn1, mx1 = b1[:3] - b1[3:] / 2, b1[:3] + b1[3:] / 2
        mn2, mx2 = b2[:3] - b2[3:] / 2, b2[:3] + b2[3:] / 2
        inter = np.clip(np.minimum(mx1, mx2) - np.maximum(mn1, mn2),
                        0, None).prod()
        union = b1[3:].prod() + b2[3:].prod() - inter
        return inter / (union + 1e-6)

    order = list(np.argsort(-scores))
    keep = []
    while order:
        cur = order.pop(0)
        keep.append(cur)
        order = [j for j in order
                 if iou(boxes[cur], boxes[j]) < iou_threshold]
    return sorted(keep)


def test_nms_matches_reference_greedy(rng):
    for trial in range(10):
        Q = 30
        # clustered boxes to force overlaps
        centers = rng.normal(size=(Q, 3)) * 0.8
        sizes = rng.uniform(0.5, 2.0, size=(Q, 3))
        boxes = np.concatenate([centers, sizes], axis=1).astype(np.float32)
        scores = rng.random(Q).astype(np.float32)
        keep = nms_3d_mask(
            jnp.asarray(boxes), jnp.asarray(scores),
            jnp.ones(Q, bool), iou_threshold=0.3)
        ours = sorted(np.where(np.asarray(keep))[0].tolist())
        ref = _greedy_reference(boxes, scores, 0.3)
        assert ours == ref, trial


def test_nms_respects_mask(rng):
    Q = 16
    boxes = np.tile(np.array([0, 0, 0, 1, 1, 1], np.float32), (Q, 1))
    scores = np.linspace(1, 0, Q).astype(np.float32)
    mask = np.zeros(Q, bool)
    mask[5] = True
    keep = np.asarray(nms_3d_mask(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(mask), 0.5))
    assert keep[5] and keep.sum() == 1


def test_post_process_confidence_and_classes(rng):
    Q, C = 30, 4
    boxes = rng.normal(size=(Q, 6)).astype(np.float32)
    boxes[:, 3:] = np.abs(boxes[:, 3:]) + 0.2
    logits = rng.normal(size=(Q, C)).astype(np.float32) * 4
    keep, labels, conf = post_process(
        jnp.asarray(boxes), jnp.asarray(logits),
        confidence_threshold=0.7, nms_threshold=0.3)
    keep = np.asarray(keep)
    conf = np.asarray(conf)
    assert np.all(conf[keep] > 0.7)
    # identical duplicated boxes of the same class collapse to one
    dup = np.tile(boxes[:1], (Q, 1))
    logits_same = np.tile(logits[:1] * 0 + np.array([9, 0, 0, 0]), (Q, 1))
    keep2, _, _ = post_process(
        jnp.asarray(dup), jnp.asarray(logits_same.astype(np.float32)))
    assert int(np.asarray(keep2).sum()) == 1


def test_nms_counts_cluster_sizes():
    from room_slam_tpu.ops.nms import nms_3d_with_counts

    boxes = jnp.asarray(np.array([
        [0.0, 0.0, 0.0, 1.0, 1.0, 1.0],    # cluster leader (3 votes)
        [0.05, 0.0, 0.0, 1.0, 1.0, 1.0],   # near-duplicate
        [0.0, 0.05, 0.0, 1.0, 1.0, 1.0],   # near-duplicate
        [5.0, 0.0, 0.0, 1.0, 1.0, 1.0],    # lone detection (1 vote)
    ], np.float32))
    scores = jnp.asarray(np.array([0.9, 0.8, 0.7, 0.6], np.float32))
    keep, counts = nms_3d_with_counts(
        boxes, scores, jnp.ones(4, bool), iou_threshold=0.5)
    assert np.asarray(keep).tolist() == [True, False, False, True]
    assert np.asarray(counts).tolist() == [3, 0, 0, 1]


def test_post_process_consensus_reranks_only():
    """Consensus rescoring must keep the same detections/labels and only
    change the ranking scores (cluster votes x softmax confidence)."""
    rng = np.random.default_rng(3)
    Q = 12
    boxes = np.zeros((Q, 6), np.float32)
    boxes[:, 3:] = 1.0
    boxes[:6, 0] = rng.normal(0.0, 0.02, 6)      # 6-vote cluster at origin
    boxes[6:, 0] = np.arange(6) * 5.0 + 10.0     # singletons
    logits = np.zeros((Q, 4), np.float32)
    logits[:, 0] = 10.0                          # saturated confidence
    keep0, lab0, conf0 = post_process(
        jnp.asarray(boxes), jnp.asarray(logits),
        confidence_threshold=0.3, nms_threshold=0.3)
    keep1, lab1, conf1 = post_process(
        jnp.asarray(boxes), jnp.asarray(logits),
        confidence_threshold=0.3, nms_threshold=0.3, consensus=True)
    assert np.array_equal(np.asarray(keep0), np.asarray(keep1))
    assert np.array_equal(np.asarray(lab0), np.asarray(lab1))
    k = np.where(np.asarray(keep1))[0]
    cluster = k[np.asarray(boxes)[k, 0] < 1.0][0]
    single = k[np.asarray(boxes)[k, 0] > 1.0][0]
    # raw confidences tie at ~1.0; consensus breaks the tie toward the
    # multi-vote cluster
    assert float(conf0[cluster]) == float(conf0[single])
    assert float(conf1[cluster]) > float(conf1[single])


def test_post_process_objectness_rescores(rng):
    """sigmoid(objectness) multiplies the softmax confidence: a saturated
    but no-object query drops below threshold, and ranking follows the
    objectness signal."""
    import jax.numpy as jnp
    import numpy as np

    Q = 6
    boxes = np.zeros((Q, 6), np.float32)
    boxes[:, :3] = np.arange(Q)[:, None] * 10.0  # far apart: no suppression
    boxes[:, 3:] = 1.0
    logits = np.full((Q, 4), -10.0, np.float32)
    logits[:, 1] = 10.0  # saturated softmax ~1.0 for class 1
    obj = np.array([8.0, -8.0, 8.0, -8.0, 8.0, -8.0], np.float32)

    keep0, _, conf0 = post_process(
        jnp.asarray(boxes), jnp.asarray(logits),
        confidence_threshold=0.5, nms_threshold=0.3)
    assert bool(keep0.all())  # without objectness everything saturates

    keep, _, conf = post_process(
        jnp.asarray(boxes), jnp.asarray(logits),
        confidence_threshold=0.5, nms_threshold=0.3,
        objectness=jnp.asarray(obj))
    keep, conf = np.asarray(keep), np.asarray(conf)
    assert keep.tolist() == [True, False, True, False, True, False]
    assert (conf[obj > 0] > 0.99).all() and (conf[obj < 0] < 0.01).all()


def test_post_process_top_k():
    """top_k keeps exactly the K highest-confidence NMS survivors —
    rank-based operating points transfer across domains where absolute
    thresholds do not (unseen-room objectness deflates uniformly)."""
    import jax.numpy as jnp
    import numpy as np

    from room_slam_tpu.ops.nms import post_process

    rng = np.random.default_rng(0)
    Q = 20
    boxes = np.zeros((Q, 6), np.float32)
    boxes[:, :3] = rng.uniform(-10, 10, (Q, 3))  # far apart: NMS keeps all
    boxes[:, 3:] = 0.5
    logits = rng.normal(size=(Q, 4)).astype(np.float32)
    obj = rng.normal(size=(Q,)).astype(np.float32)

    keep_all, _, conf = post_process(
        jnp.asarray(boxes), jnp.asarray(logits), confidence_threshold=0.0,
        nms_threshold=0.3, objectness=jnp.asarray(obj))
    keep_k, _, conf_k = post_process(
        jnp.asarray(boxes), jnp.asarray(logits), confidence_threshold=0.0,
        nms_threshold=0.3, objectness=jnp.asarray(obj), top_k=5)
    keep_all, keep_k = np.asarray(keep_all), np.asarray(keep_k)
    assert keep_all.sum() == Q and keep_k.sum() == 5
    # the kept 5 are precisely the highest-confidence kept detections
    conf = np.asarray(conf)
    top5 = set(np.argsort(-conf)[:5].tolist())
    assert set(np.nonzero(keep_k)[0].tolist()) == top5
    # top_k larger than survivors is a no-op
    keep_big, _, _ = post_process(
        jnp.asarray(boxes), jnp.asarray(logits), confidence_threshold=0.0,
        nms_threshold=0.3, objectness=jnp.asarray(obj), top_k=50)
    assert np.asarray(keep_big).sum() == Q


def test_weighted_box_fusion():
    """nms_3d_fused: a kept box becomes the score-weighted mean of its
    cluster; isolated boxes are untouched; keep/labels/conf from
    post_process(fuse=True) are identical to the unfused call."""
    import pytest

    from room_slam_tpu.ops.nms import nms_3d_fused

    # cluster of two overlapping boxes + one isolated box
    boxes = jnp.asarray([
        [0.0, 0.0, 0.0, 2.0, 2.0, 2.0],
        [0.2, 0.0, 0.0, 2.0, 2.0, 2.0],   # IoU with first well above 0.3
        [9.0, 0.0, 0.0, 1.0, 1.0, 1.0],
    ])
    scores = jnp.asarray([0.75, 0.25, 0.5])
    mask = jnp.ones(3, bool)
    keep, counts, fused = nms_3d_fused(boxes, scores, mask,
                                       iou_threshold=0.3)
    keep, counts, fused = (np.asarray(a) for a in (keep, counts, fused))
    assert keep.tolist() == [True, False, True]
    assert counts[0] == 2 and counts[2] == 1
    want = (0.75 * np.asarray(boxes[0]) + 0.25 * np.asarray(boxes[1]))
    np.testing.assert_allclose(fused[0], want, atol=1e-6)
    np.testing.assert_allclose(fused[2], np.asarray(boxes[2]), atol=0)

    # post_process contract: fuse only changes the returned boxes
    logits = jnp.zeros((3, 4)).at[:, 1].set(4.0)
    base = post_process(boxes, logits, confidence_threshold=0.0,
                        nms_threshold=0.3)
    k2, l2, c2, b2 = post_process(boxes, logits, confidence_threshold=0.0,
                                  nms_threshold=0.3, fuse=True,
                                  return_boxes=True)
    for a, b in zip(base, (k2, l2, c2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # same-score cluster -> plain mean of the two boxes, carried by
    # whichever of the pair the tie-break kept
    kept = np.nonzero(np.asarray(k2))[0]
    rep = [i for i in kept if i in (0, 1)]
    assert len(rep) == 1
    np.testing.assert_allclose(np.asarray(b2[rep[0]]),
                               np.asarray((boxes[0] + boxes[1]) / 2),
                               atol=1e-6)
    with pytest.raises(ValueError):
        post_process(boxes, logits, fuse=True)


def test_support_ordered_nms_rescues_agreed_cluster():
    """A lone high-confidence wrong box overlapping a multi-view-supported
    cluster must NOT suppress it when support ordering is on (the zero-shot
    post-process failure measured in results/r4_B_zeroshot_diagnosis_*)."""
    # 4 near-identical "views" of the true box + 1 confident outlier that
    # overlaps them enough for nms 0.1 to pick one winner for the group
    true = [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]
    jitter = [[dx, 0, 0, 1, 1, 1] for dx in (0.0, 0.05, -0.05, 0.02)]
    outlier = [0.8, 0.0, 0.0, 1.4, 1.0, 1.4]  # overlaps the cluster
    boxes = jnp.asarray(jitter + [outlier], dtype=jnp.float32)
    # logits: all same class, outlier most confident
    logits = jnp.asarray([[2.0, 0.0]] * 4 + [[6.0, 0.0]])

    keep_plain, _, _ = post_process(
        boxes, logits, confidence_threshold=0.0, nms_threshold=0.1)
    # plain: the outlier wins its overlap group
    assert bool(keep_plain[4])

    keep_sup, _, conf_sup = post_process(
        boxes, logits, confidence_threshold=0.0, nms_threshold=0.1,
        support=0.5)
    # support: the agreed-on cluster outranks the loner, which now
    # gets suppressed by the kept cluster representative
    kept = np.nonzero(np.asarray(keep_sup))[0]
    assert all(k < 4 for k in kept), kept
    # and the kept box's ranking confidence reflects the vote
    assert float(conf_sup[kept[0]]) > float(conf_sup[4])


def test_support_none_is_identity():
    rng = np.random.default_rng(0)
    boxes = jnp.asarray(rng.uniform(-2, 2, (12, 6)).astype(np.float32))
    boxes = boxes.at[:, 3:].set(jnp.abs(boxes[:, 3:]) + 0.3)
    logits = jnp.asarray(rng.normal(size=(12, 3)).astype(np.float32))
    a = post_process(boxes, logits, confidence_threshold=0.1,
                     nms_threshold=0.3)
    b = post_process(boxes, logits, confidence_threshold=0.1,
                     nms_threshold=0.3, support=None)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_conf_scale_demotes_for_ranking_not_threshold():
    """conf_scale reranks but must not change what passes the absolute
    confidence threshold (physics rescoring is ranking-only)."""
    boxes = jnp.asarray([[0, 0, 0, 1, 1, 1],
                         [5, 0, 0, 1, 1, 1]], dtype=jnp.float32)
    logits = jnp.asarray([[4.0, 0.0], [2.0, 0.0]])
    scale = jnp.asarray([1e-3, 1.0])  # demote box 0 hard
    keep, labels, conf = post_process(
        boxes, logits, confidence_threshold=0.5, nms_threshold=0.3,
        conf_scale=scale)
    # box 0 still passes the threshold (raw conf gates) ...
    assert bool(keep[0]) and bool(keep[1])
    # ... but now ranks below box 1
    assert float(conf[0]) < float(conf[1])


def test_soft_nms_survivor_and_dup_absorption():
    """The motivating zero-shot failure (PARITY round 4): a lone
    wrong-but-confident box loosely overlaps a multi-view-agreed cluster.
    Hard NMS at IoU 0.1 kills the cluster; soft-NMS keeps it (decayed) and
    still absorbs the cluster's near-identical duplicates."""
    from room_slam_tpu.ops.nms import soft_nms_3d_fused

    boxes = np.array([
        [0.0, 0.0, 0.0, 2.0, 1.0, 2.0],    # wrong, confident
        [0.8, 0.0, 0.8, 2.0, 1.0, 2.0],    # correct cluster member A
        [0.82, 0.0, 0.82, 2.0, 1.0, 2.0],  # near-identical duplicate of A
        [9.0, 0.0, 9.0, 1.0, 1.0, 1.0],    # far box, untouched
    ], np.float32)
    scores = np.array([0.9, 0.5, 0.45, 0.3], np.float32)
    keep, counts, fused, conf = (np.asarray(a) for a in soft_nms_3d_fused(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(4, bool),
        dup_threshold=0.5, sigma=0.25))
    # the loosely-overlapped correct box SURVIVES (hard NMS at 0.1 kills it)
    hard = np.asarray(nms_3d_mask(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(4, bool), 0.1))
    assert not hard[1]
    assert keep[0] and keep[1] and keep[3]
    # ...but its duplicate is absorbed into its fused cluster
    assert not keep[2]
    assert counts[1] == 2
    # fusion weights are the DECAYED scores at keep time (= emitted conf)
    np.testing.assert_allclose(
        fused[1],
        (conf[1] * boxes[1] + conf[2] * boxes[2]) / (conf[1] + conf[2]),
        rtol=1e-4)
    # decay ordering: the survivor is demoted below its raw score, the
    # far box is untouched
    assert 0 < conf[1] < 0.5
    assert conf[3] == 0.3 and conf[0] == 0.9


def test_soft_nms_zero_overlap_is_identity():
    from room_slam_tpu.ops.nms import soft_nms_3d_fused

    boxes = np.array([[i * 10.0, 0, 0, 1, 1, 1] for i in range(5)],
                     np.float32)
    scores = np.linspace(0.9, 0.1, 5).astype(np.float32)
    keep, counts, fused, conf = (np.asarray(a) for a in soft_nms_3d_fused(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(5, bool)))
    assert keep.all() and (counts == 1).all()
    np.testing.assert_allclose(conf, scores, rtol=1e-6)
    np.testing.assert_allclose(fused, boxes, rtol=1e-6)


def test_post_process_soft_sigma_reranks_and_fuses(rng):
    Q = 24
    boxes = np.concatenate([rng.normal(size=(Q, 3)) * 0.5,
                            rng.uniform(0.8, 2.0, size=(Q, 3))],
                           axis=1).astype(np.float32)
    logits = rng.normal(size=(Q, 4)).astype(np.float32)
    keep, labels, conf, out = post_process(
        jnp.asarray(boxes), jnp.asarray(logits), confidence_threshold=0.0,
        nms_threshold=0.5, soft_sigma=0.25, fuse=True, return_boxes=True)
    keep, conf = np.asarray(keep), np.asarray(conf)
    # soft mode keeps at least as many as hard NMS at the same threshold
    hkeep, _, _ = post_process(
        jnp.asarray(boxes), jnp.asarray(logits), confidence_threshold=0.0,
        nms_threshold=0.5)
    assert keep.sum() >= np.asarray(hkeep).sum()
    assert np.isfinite(conf[keep]).all() and (conf[keep] > 0).all()
