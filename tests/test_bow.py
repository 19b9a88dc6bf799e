"""Tests for the BoW vocabulary tree and keyframe database."""

import jax.numpy as jnp
import numpy as np
import pytest

from slam_framework_tpu.bow import database, vocabulary


@pytest.fixture(scope="module")
def sample_descs(rng=None):
    r = np.random.default_rng(4)
    # clustered binary descriptors: 50 clusters with bit-flip noise
    centers = r.integers(0, 2**32, (50, 8), dtype=np.uint64).astype(np.uint32)
    out = []
    for c in centers:
        for _ in range(40):
            noise = np.zeros(8, np.uint32)
            for _ in range(6):  # flip ~6 bits
                w = r.integers(0, 8)
                noise[w] ^= np.uint32(1) << np.uint32(r.integers(0, 32))
            out.append(c ^ noise)
    return np.stack(out)


@pytest.fixture(scope="module")
def vocab(sample_descs):
    return vocabulary.train(sample_descs, k=5, depth=3, seed=0)


def test_train_builds_tree(vocab):
    assert vocab.num_words > 20
    assert vocab.node_children.shape[1] == 5
    # leaves have word ids, inner nodes don't
    leaves = vocab.node_word >= 0
    assert (vocab.node_children[leaves] < 0).all()


def test_transform_same_descriptor_same_word(vocab, sample_descs):
    tables = vocab.device_tables()
    d = jnp.asarray(sample_descs[:64])
    w1, g1, _ = vocabulary.transform(tables, d, jnp.ones(64, bool), vocab.depth, vocab.k)
    w2, g2, _ = vocabulary.transform(tables, d, jnp.ones(64, bool), vocab.depth, vocab.k)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    assert (np.asarray(w1) >= 0).all()


def test_transform_noise_robustness(vocab, sample_descs):
    """Descriptors from the same cluster should mostly map to the same word."""
    tables = vocab.device_tables()
    cluster = sample_descs[:40]  # all from cluster 0
    w, _, _ = vocabulary.transform(
        tables, jnp.asarray(cluster), jnp.ones(40, bool), vocab.depth, vocab.k
    )
    w = np.asarray(w)
    _, counts = np.unique(w, return_counts=True)
    assert counts.max() >= 20  # majority share a word


def test_transform_invalid_masked(vocab, sample_descs):
    tables = vocab.device_tables()
    valid = jnp.asarray([True] * 10 + [False] * 10)
    w, g, wt = vocabulary.transform(
        tables, jnp.asarray(sample_descs[:20]), valid, vocab.depth, vocab.k
    )
    assert (np.asarray(w)[10:] == -1).all()


def make_bow(vocab, descs):
    tables = vocab.device_tables()
    w, _, wt = vocabulary.transform(
        tables, jnp.asarray(descs), jnp.ones(len(descs), bool), vocab.depth, vocab.k
    )
    return database.BowFrame(np.asarray(w))


def test_bow_score_self_is_max(vocab, sample_descs):
    b1 = make_bow(vocab, sample_descs[:200])
    b2 = make_bow(vocab, sample_descs[1000:1200])
    s_self = b1.score(b1)
    s_cross = b1.score(b2)
    assert abs(s_self - 1.0) < 1e-5
    assert s_cross < s_self


def test_database_loop_candidates(vocab, sample_descs):
    db = database.KeyframeDatabase(vocab.num_words)
    # 5 "places": frames 0..4 from distinct clusters; frame 5 revisits place 1
    frames = []
    for i in range(5):
        descs = sample_descs[i * 400 : i * 400 + 300]
        bow = make_bow(vocab, descs)
        frames.append(bow)
        db.add(i, bow)
    query = make_bow(vocab, sample_descs[400:700][::-1])  # same place as kf 1
    cands = db.detect_loop_candidates(query, min_score=0.05, connected=set())
    assert 1 in cands, cands
    # excluding the connected set removes it
    cands2 = db.detect_loop_candidates(query, min_score=0.05, connected={1})
    assert 1 not in cands2


def test_database_reloc_candidates(vocab, sample_descs):
    db = database.KeyframeDatabase(vocab.num_words)
    for i in range(5):
        db.add(i, make_bow(vocab, sample_descs[i * 400 : i * 400 + 300]))
    query = make_bow(vocab, sample_descs[800:1100])  # place 2
    cands = db.detect_relocalization_candidates(query)
    assert 2 in cands


def test_database_erase(vocab, sample_descs):
    db = database.KeyframeDatabase(vocab.num_words)
    bow = make_bow(vocab, sample_descs[:300])
    db.add(0, bow)
    db.erase(0)
    assert db.detect_relocalization_candidates(bow) == []


def test_orbvoc_text_roundtrip(tmp_path, vocab, sample_descs):
    """save_orbvoc_text -> load_orbvoc_text reproduces the vocabulary: same
    structure, and the SAME transform — every query descriptor descends to a
    leaf with identical center descriptor and identical weight (word ids are a
    relabeling across serializations; leaf identity is the invariant)."""
    path = tmp_path / "voc.txt"
    vocabulary.save_orbvoc_text(vocab, str(path))
    loaded = vocabulary.load_orbvoc_text(str(path))
    assert loaded.k == vocab.k
    assert loaded.depth == vocab.depth
    assert loaded.num_words == vocab.num_words
    np.testing.assert_array_equal(
        np.sort(loaded.node_desc.reshape(-1)), np.sort(vocab.node_desc.reshape(-1))
    )

    q = sample_descs[::7]
    def leaf_info(v, d):
        words = vocabulary.transform_host(v, d)
        leaf_nodes = np.zeros(len(words), np.int64)
        node_of_word = np.full(v.num_words, -1, np.int64)
        node_of_word[v.node_word[v.node_word >= 0]] = np.nonzero(v.node_word >= 0)[0]
        leaf_nodes = node_of_word[words]
        return v.node_desc[leaf_nodes], v.node_weight[leaf_nodes]

    d0, w0 = leaf_info(vocab, q)
    d1, w1 = leaf_info(loaded, q)
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_allclose(w0, w1, rtol=1e-5)


def test_idf_refit_and_scale_training(sample_descs):
    """10k-word-regime training (k=10, depth=4) + IDF refit: ubiquitous words get
    low weight, rare words high weight (TemplatedVocabulary TF-IDF semantics)."""
    voc = vocabulary.train(sample_descs, k=10, depth=4, seed=1)
    assert voc.num_words >= 50  # sample has 50 clusters; tree resolves them
    words_per_frame = [
        vocabulary.transform_host(voc, sample_descs[i * 40 : (i + 1) * 40])
        for i in range(50)
    ]
    vocabulary.refit_idf(voc, words_per_frame)
    leaf_w = voc.node_weight[voc.node_word >= 0]
    leaf_words = voc.node_word[voc.node_word >= 0]
    df = np.zeros(voc.num_words, np.int64)
    for w in words_per_frame:
        df[np.unique(w)] += 1
    seen = df[leaf_words] > 0
    # a word present in every frame must weigh less than a single-frame word
    if (df[leaf_words] == 1).any() and (df[leaf_words] >= 25).any():
        assert leaf_w[df[leaf_words] == 1].min() > leaf_w[df[leaf_words] >= 25].max()
    assert (leaf_w > 0).all()
    assert seen.any()


def test_loop_precision_recall_revisit():
    """Place-recognition quality on a revisit sequence: 40 distinct places, each
    seen twice (frames i and i+40 draw from the same descriptor clusters).
    detect_loop_candidates must recall the true revisit with high precision."""
    r = np.random.default_rng(7)
    n_places, per_place = 40, 30
    place_centers = [
        r.integers(0, 2**32, (12, 8), dtype=np.uint64).astype(np.uint32)
        for _ in range(n_places)
    ]
    def render(place, seed):
        rr = np.random.default_rng(seed)
        out = []
        for _ in range(per_place):
            c = place_centers[place][rr.integers(0, 12)].copy()
            for _ in range(4):
                w = rr.integers(0, 8)
                c[w] ^= np.uint32(1) << np.uint32(rr.integers(0, 32))
            out.append(c)
        return np.stack(out)

    frames = [render(p, 100 + p) for p in range(n_places)] + [
        render(p, 900 + p) for p in range(n_places)
    ]
    all_desc = np.concatenate(frames)
    voc = vocabulary.train(all_desc, k=10, depth=3, seed=2)
    word_lists = [vocabulary.transform_host(voc, f) for f in frames]
    vocabulary.refit_idf(voc, word_lists)
    word_lists = [vocabulary.transform_host(voc, f) for f in frames]
    db = database.KeyframeDatabase(voc.num_words)
    bows = []
    node_of_word = np.full(voc.num_words, -1, np.int64)
    node_of_word[voc.node_word[voc.node_word >= 0]] = np.nonzero(voc.node_word >= 0)[0]
    for i, wl in enumerate(word_lists):
        w_weights = voc.node_weight[node_of_word[wl]]
        bow = database.BowFrame(wl.astype(np.int64), w_weights)
        bows.append(bow)
        db.add(i, bow)
    hits = 0
    total = 0
    for q in range(n_places, 2 * n_places):
        truth = q - n_places
        # exclude temporal neighbors like the covisible-set exclusion
        connected = {q, q - 1, q + 1}
        cands = db.detect_loop_candidates(bows[q], min_score=0.01, connected=connected)
        cands = [c for c in cands if c != q]
        total += 1
        if truth in cands[:3]:
            hits += 1
    assert hits / total >= 0.9, f"revisit recall {hits}/{total}"
