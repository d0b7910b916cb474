"""CPDAG conversion and equivalence-class SHD.

The decisive oracle: at d=4, enumerate EVERY DAG, group into Markov
equivalence classes by the Verma–Pearl criterion (same skeleton, same
v-structures), and build each class's CPDAG from first principles — an
edge is directed in the CPDAG iff it has that orientation in every member
DAG. Chickering's algorithm must reproduce that exactly for all members.
"""
import itertools

import numpy as onp
import pytest

from dibs_tpu.ops.cpdag import dag_to_cpdag, eltwise_dag_to_cpdag, pdag_shd


def _all_dags(d):
    """Every DAG on d labeled nodes, as 0/1 adjacency matrices."""
    pairs = list(itertools.combinations(range(d), 2))
    dags = []
    for states in itertools.product((0, 1, 2), repeat=len(pairs)):
        a = onp.zeros((d, d), dtype=onp.int8)
        for (i, j), s in zip(pairs, states):
            if s == 1:
                a[i, j] = 1
            elif s == 2:
                a[j, i] = 1
        if _is_dag(a):
            dags.append(a)
    return dags


def _is_dag(a):
    a = a.copy().astype(onp.int64)
    d = a.shape[0]
    m = onp.eye(d, dtype=onp.int64) + a
    p = onp.linalg.matrix_power(m.astype(float), d)
    return onp.trace(p) == float(d)


def _skeleton(a):
    return tuple(map(tuple, ((a + a.T) > 0).astype(int)))


def _v_structures(a):
    """Frozenset of immoralities (i, j, k): i→j←k with i,k non-adjacent."""
    d = a.shape[0]
    vs = set()
    for j in range(d):
        parents = onp.flatnonzero(a[:, j])
        for i, k in itertools.combinations(parents.tolist(), 2):
            if a[i, k] == 0 and a[k, i] == 0:
                vs.add((min(i, k), j, max(i, k)))
    return frozenset(vs)


def _consensus_cpdag(members):
    """CPDAG = union of orientations over the class: entry (i, j) is 1 iff
    some member has i→j; pairs oriented both ways become undirected."""
    out = onp.zeros_like(members[0])
    for m in members:
        out |= m
    return out


@pytest.mark.parametrize("d", [3, 4])
def test_chickering_matches_brute_force_mec(d):
    classes = {}
    for a in _all_dags(d):
        key = (_skeleton(a), _v_structures(a))
        classes.setdefault(key, []).append(a)
    assert len(classes) > 1
    for members in classes.values():
        expect = _consensus_cpdag(members)
        for a in members:
            got = dag_to_cpdag(a)
            assert (got == expect).all(), (a, got, expect)


def test_known_small_cases():
    # chain 0→1→2: no v-structure ⇒ fully reversible (undirected)
    chain = onp.array([[0, 1, 0], [0, 0, 1], [0, 0, 0]])
    c = dag_to_cpdag(chain)
    assert (c == (chain + chain.T)).all()

    # collider 0→2←1: both edges compelled
    coll = onp.array([[0, 0, 1], [0, 0, 1], [0, 0, 0]])
    assert (dag_to_cpdag(coll) == coll).all()

    # collider + downstream edge 2→3: the tail edge is compelled too
    # (reversing it would create a new v-structure at 2)
    g = onp.zeros((4, 4), dtype=onp.int8)
    g[0, 2] = g[1, 2] = g[2, 3] = 1
    assert (dag_to_cpdag(g) == g).all()


def test_cyclic_input_raises():
    cyc = onp.array([[0, 1, 0], [0, 0, 1], [1, 0, 0]])
    with pytest.raises(ValueError):
        dag_to_cpdag(cyc)


def test_pdag_shd_cases():
    # identical ⇒ 0
    a = onp.array([[0, 1, 0], [0, 0, 1], [0, 0, 0]])
    assert pdag_shd(a, a) == 0
    # orientation flip on one pair ⇒ 1
    b = a.copy()
    b[0, 1], b[1, 0] = 0, 1
    assert pdag_shd(a, b) == 1
    # directed vs undirected on one pair ⇒ 1
    c = a.copy()
    c[1, 0] = 1
    assert pdag_shd(a, c) == 1
    # missing edge ⇒ 1
    e = a.copy()
    e[0, 1] = 0
    assert pdag_shd(a, e) == 1
    # batch broadcasting
    batch = onp.stack([a, b, c, e])
    out = pdag_shd(batch, a[None])
    assert out.tolist() == [0, 1, 1, 1]


def test_equivalent_dags_have_zero_cpdag_shd():
    """Markov-equivalent particles must not be charged: same chain, two
    orientations — plain SHD 2, CPDAG-SHD 0."""
    g1 = onp.array([[0, 1, 0], [0, 0, 1], [0, 0, 0]])  # 0→1→2
    g2 = onp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]])  # 2→1→0
    assert pdag_shd(dag_to_cpdag(g1), dag_to_cpdag(g2)) == 0


def test_expected_cpdag_shd_metric():
    import jax.numpy as jnp

    from dibs_tpu.metrics import ParticleDistribution, expected_cpdag_shd, expected_shd

    g_gt = onp.array([[0, 1, 0], [0, 0, 1], [0, 0, 0]])  # chain 0→1→2
    flipped = onp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]])  # 2→1→0, same MEC
    dist = ParticleDistribution(
        logp=jnp.zeros(2), g=jnp.asarray(onp.stack([g_gt, flipped]))
    )
    # plain SHD charges the equivalent particle; CPDAG-SHD does not
    assert float(expected_cpdag_shd(dist=dist, g=jnp.asarray(g_gt))) == 0.0
    assert float(expected_shd(dist=dist, g=jnp.asarray(g_gt))) > 0.0

    # all-cyclic fallback matches expected_shd's d(d-1)/2
    cyc = onp.array([[0, 1, 0], [0, 0, 1], [1, 0, 0]])
    dist_cyc = ParticleDistribution(
        logp=jnp.zeros(1), g=jnp.asarray(cyc[None])
    )
    assert expected_cpdag_shd(dist=dist_cyc, g=jnp.asarray(g_gt)) == 3.0


def test_bge_score_constant_across_mec():
    """The defining BGe property meets the CPDAG machinery: every member
    of an equivalence class (as found by the brute-force grouping) gets
    the same BGe marginal likelihood."""
    import jax.numpy as jnp
    from jax import random

    from dibs_tpu.models import BGe

    d = 4
    x = random.normal(random.PRNGKey(0), (40, d))
    model = BGe(n_vars=d)
    interv = jnp.zeros_like(x)

    classes = {}
    for a in _all_dags(d):
        key = (_skeleton(a), _v_structures(a))
        classes.setdefault(key, []).append(a)
    # pick a few multi-member classes
    multi = [m for m in classes.values() if len(m) > 1][:5]
    assert multi
    for members in multi:
        scores = [
            float(model.interventional_log_marginal_prob(
                jnp.asarray(g, dtype=jnp.float32), None, x, interv, None))
            for g in members
        ]
        assert max(scores) - min(scores) < 1e-3 * max(1.0, abs(scores[0]))
