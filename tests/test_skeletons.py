"""Consistency checks for the built-in skeleton-convention tables.

The reference ships these as a pickle asset (`multiperson_model.py:30-40`);
here they are first-party constants, so structural invariants (joint-count
suffixes, edge validity, left/right mirror symmetry) are enforced by test.
"""

import numpy as np

from metrabs_tpu.pipeline import skeletons as sk


def test_builtin_names_match_reference_list():
    for name in sk.BUILTIN_SKELETONS:
        assert name in sk.REFERENCE_SKELETON_NAMES


def test_joint_count_matches_name_suffix():
    for name, ji in sk.BUILTIN_SKELETONS.items():
        n = int(name.rsplit('_', 1)[1])
        assert ji.n_joints == n, f'{name}: {ji.n_joints} joints'


def test_edges_are_valid_and_connected():
    for name, ji in sk.BUILTIN_SKELETONS.items():
        n = ji.n_joints
        assert all(0 <= a < n and 0 <= b < n and a != b for a, b in ji.edges)
        # The kinematic tree must reach every joint (single component).
        adj = {i: set() for i in range(n)}
        for a, b in ji.edges:
            adj[a].add(b)
            adj[b].add(a)
        seen, stack = {0}, [0]
        while stack:
            for j in adj[stack.pop()]:
                if j not in seen:
                    seen.add(j)
                    stack.append(j)
        if name == 'lsp_14':
            # LSP has no pelvis/spine joint; its leg chain is genuinely a
            # separate component from the arm/neck chain (the hip-hip edge
            # links the legs, but nothing connects hips to shoulders).
            assert len(seen) in (6, n), name
        else:
            assert len(seen) == n, f'{name}: disconnected skeleton'


def test_mirror_mapping_is_involution_and_pairs_sides():
    for name, ji in sk.BUILTIN_SKELETONS.items():
        m = ji.mirror_mapping
        np.testing.assert_array_equal(m[m], np.arange(ji.n_joints),
                                      err_msg=name)
        for i, jname in enumerate(ji.names):
            if jname.startswith('l') and ('r' + jname[1:]) in ji.names:
                assert ji.names[m[i]] == 'r' + jname[1:], (name, jname)


def test_mirror_swaps_every_lateral_joint():
    # Every left joint must have a right counterpart and vice versa —
    # otherwise the TTA flip unswap would silently misroute that joint.
    for name, ji in sk.BUILTIN_SKELETONS.items():
        m = ji.mirror_mapping
        lateral = [i for i, n in enumerate(ji.names)
                   if n.startswith(('l', 'r')) and
                   ('r' + n[1:] in ji.names or 'l' + n[1:] in ji.names)]
        for i in lateral:
            assert m[i] != i, (name, ji.names[i])


def test_smpl_head_30_extends_smpl_24():
    assert sk.SMPL_HEAD_30.names[:24] == sk.SMPL_24.names
    assert sk.SMPL_HEAD_30.edges[:len(sk.SMPL_24.edges)] == sk.SMPL_24.edges


def test_registry_resolves_new_builtins_when_covered():
    # A model joint set that is the union of all built-in names resolves
    # every convention to valid static indices.
    all_names = []
    for ji in sk.BUILTIN_SKELETONS.values():
        for n in ji.names:
            if n not in all_names:
                all_names.append(n)
    model_ji = sk.make_joint_info(all_names, [])
    reg = sk.SkeletonRegistry(model_ji)
    for name in ('jta_22', 'total_capture_21', 'smpl+head_30'):
        idx = reg.indices(name)
        assert idx.shape[0] == sk.BUILTIN_SKELETONS[name].n_joints
        assert np.all(idx >= 0) and np.all(idx < model_ji.n_joints)
