"""Shipped bone-prior asset: coverage, determinism, internal consistency.

Reference analogue: the dataset-mean bone lengths frozen into every
SavedModel (`multiperson/plausibility_check.py:12-16`). No real datasets
exist in this environment, so the shipped asset derives from the canonical
anthropometric template; these tests cross-validate it internally
(mirror-symmetric bones must agree) and pin the regeneration path.
"""

import numpy as np
import pytest

from metrabs_tpu.pipeline import bone_priors
from metrabs_tpu.pipeline.skeletons import BUILTIN_SKELETONS


def test_asset_covers_all_builtin_skeletons():
    data = bone_priors.load_builtin_priors()
    assert set(data) == set(BUILTIN_SKELETONS)
    for name, ji in BUILTIN_SKELETONS.items():
        entry = data[name]
        assert entry['names'] == list(ji.names)
        assert entry['edges'] == [[int(i), int(j)] for i, j in ji.edges]
        mean = np.asarray(entry['mean_mm'])
        assert mean.shape == (len(ji.edges),)
        assert np.all(np.isfinite(mean))
        # Anthropometric sanity: every bone within human range.
        assert np.all(mean > 20) and np.all(mean < 600), name


def test_asset_matches_regeneration():
    """scripts/gen_bone_priors.py is deterministic; the checked-in asset
    must equal a fresh accumulation (drift means someone edited the asset
    by hand or changed the template without regenerating)."""
    fresh = bone_priors.accumulate_builtin_priors(n_samples=512, seed=0)
    data = bone_priors.load_builtin_priors()
    for name, entry in fresh.items():
        np.testing.assert_allclose(
            data[name]['mean_mm'], entry['mean_mm'], rtol=1e-6,
            err_msg=name)


def test_mirror_symmetric_bones_agree():
    """Internal cross-validation: for every skeleton, each left bone's prior
    must match its mirrored right bone (the template is bilaterally
    symmetric and the jitter is isotropic, so asymmetry indicates a
    transcription error in the template or edge tables)."""
    data = bone_priors.load_builtin_priors()
    checked = 0
    for name, ji in BUILTIN_SKELETONS.items():
        mean = np.asarray(data[name]['mean_mm'])
        mirror = ji.mirror_mapping
        edge_key = {}
        for e, (i, j) in enumerate(ji.edges):
            edge_key[frozenset((i, j))] = e
        for e, (i, j) in enumerate(ji.edges):
            m = frozenset((int(mirror[i]), int(mirror[j])))
            if m in edge_key and edge_key[m] != e:
                np.testing.assert_allclose(
                    mean[e], mean[edge_key[m]], rtol=0.05,
                    err_msg=f'{name} edge {ji.edges[e]}')
                checked += 1
    assert checked > 100  # the built-ins have plenty of mirrored pairs


def test_priors_for_joint_info_matching():
    h36m = BUILTIN_SKELETONS['h36m_17']
    got = bone_priors.priors_for_joint_info(h36m)
    assert got is not None and got.shape == (16,)

    # Same names, different edge ORDER: must NOT match (the plausibility
    # filter indexes priors by edge position).
    import dataclasses
    reordered = dataclasses.replace(
        h36m, edges=tuple(reversed(h36m.edges)))
    assert bone_priors.priors_for_joint_info(reordered) is None


def test_template_rejects_unknown_joint():
    with pytest.raises(KeyError):
        bone_priors.template_for('h36m_17', ['pelv', 'no_such_joint'])
