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


def test_orbvoc_text_roundtrip(tmp_path, vocab):
    """Write a small vocab in ORBvoc.txt format and load it back."""
    path = tmp_path / "voc.txt"
    # serialize our trained vocab in the reference format (BFS order, parents first)
    lines = [f"{vocab.k} {vocab.depth} 0 0\n"]
    # nodes excluding root, in id order (parents always have smaller ids here)
    id_map = {0: 0}
    for i in range(1, vocab.num_nodes):
        parent = int(np.nonzero((vocab.node_children == i).any(axis=1))[0][0])
        is_leaf = int(vocab.node_word[i] >= 0)
        b = vocab.node_desc[i].view(np.uint8)
        lines.append(
            f"{id_map[parent]} {is_leaf} " + " ".join(str(x) for x in b) + f" {vocab.node_weight[i]}\n"
        )
        id_map[i] = len(id_map)
    path.write_text("".join(lines))
    loaded = vocabulary.load_orbvoc_text(str(path))
    assert loaded.k == vocab.k
    assert loaded.num_words == vocab.num_words
    np.testing.assert_array_equal(
        np.sort(loaded.node_desc.reshape(-1)), np.sort(vocab.node_desc.reshape(-1))
    )
