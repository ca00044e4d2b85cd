"""Induction machine subsystem: parsers, transfer factors, machine state,
custom solvers — against synthetic fixtures and the live reference helpers
(reference tests/induction_machine/* test the same surface against
checked-in im_3kW fixtures)."""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(REPO, "tools", "mpi4py_stub"))

from pymgrit_tpu.models.induction_machine import io_getdp
from pymgrit_tpu.models.induction_machine.machine_state import (
    MachineState, machine_norm, zero_state)
from pymgrit_tpu.models.induction_machine.solvers import MgritMachineConvJl, MgritMachine
from pymgrit_tpu.core.application import Application


# ---------------------------------------------------------------------------
# synthetic fixtures
# ---------------------------------------------------------------------------

def _write_msh(path, nodes, lines, triangles):
    """Tiny gmsh v4-style mesh with one node block and one block per
    element family."""
    out = ["$MeshFormat", "4 0 8", "$EndMeshFormat", "$Nodes",
           f"1 {len(nodes)}", f"3 3 0 {len(nodes)}"]
    for tag, (x, y) in nodes:
        out.append(f"{tag} {x} {y} 0")
    out += ["$EndNodes", "$Elements", "2 %d" % (len(lines) + len(triangles))]
    out.append(f"1 1 1 {len(lines)}")
    for tag, (a, b) in lines:
        out.append(f"{tag} {a} {b}")
    out.append(f"2 2 2 {len(triangles)}")
    for tag, (a, b, c) in triangles:
        out.append(f"{tag} {a} {b} {c}")
    out += ["$EndElements", ""]
    with open(path, "w") as f:
        f.write("\n".join(out))


def _write_pre(path, mapping_rows, num_dofs):
    """Tiny .pre file: 9 header lines, mapping rows, 35 footer lines; the
    $DofData header carries num_dofs on its 6th line."""
    header = ["$Resolution /* fake */", "1 1", "$EndResolution", "$DofData  /* #0 */",
              "1 1", "0", "0", "1 " + str(num_dofs), "dummy"]
    # reference pre_file slices content[9:-35]
    footer = ["footer"] * 34 + ["$EndDofData"]
    rows = [" ".join(map(str, r)) for r in mapping_rows]
    with open(path, "w") as f:
        f.write("\n".join(header + rows + footer) + "\n")


def _square_mesh(tmp_path, name, n_side, unknown_start=1000):
    """Unit-square triangulated mesh scaled inside the rotor radius; corner
    nodes are 'boundary' unknowns."""
    scale = 0.02  # inside the inner radius 0.0457
    tags, nodes, idx = [], [], {}
    t = 1
    for i in range(n_side):
        for j in range(n_side):
            x = scale * i / (n_side - 1) + 0.001
            y = scale * j / (n_side - 1) + 0.001
            nodes.append((str(t), (x, y)))
            idx[(i, j)] = str(t)
            t += 1
    triangles = []
    et = 1
    for i in range(n_side - 1):
        for j in range(n_side - 1):
            a, b, c, d = idx[(i, j)], idx[(i + 1, j)], idx[(i + 1, j + 1)], idx[(i, j + 1)]
            triangles.append((str(et), (a, b, c))); et += 1
            triangles.append((str(et), (a, c, d))); et += 1
    lines = [(str(et + k), (idx[(0, 0)], idx[(n_side - 1, 0)])) for k in range(1)]

    msh = str(tmp_path / f"{name}.msh")
    _write_msh(msh, nodes, lines, triangles)

    # .pre mapping: every node is an unknown except the two line endpoints
    boundary_tags = {idx[(0, 0)], idx[(n_side - 1, 0)]}
    rows = []
    un = unknown_start
    for tag, _ in nodes:
        if tag in boundary_tags:
            rows.append((1, tag, 0, 0, 0))
        else:
            rows.append((1, tag, 0, 0, un))
            un += 1
    pre = str(tmp_path / f"{name}.pre")
    _write_pre(pre, rows, num_dofs=un - unknown_start)
    return msh, pre


# ---------------------------------------------------------------------------
# parser + transfer tests
# ---------------------------------------------------------------------------

def test_msh_pre_parsers(tmp_path):
    msh, pre = _square_mesh(tmp_path, "m1", 3)
    io_getdp.check_version(msh)
    nodes, nodes_r = io_getdp.get_nodes(msh)
    assert len(nodes) == 9
    lines, tris, lines_r, tris_r = io_getdp.get_elements(msh)
    assert len(tris) == 8 and len(lines) == 1
    cor_to_un, un_to_cor, boundary = io_getdp.pre_file(pre)
    assert len(boundary) == 2
    assert len(un_to_cor) == 7


def test_parsers_match_reference(tmp_path):
    """Our parsers produce the same structures as the reference helper on
    the same synthetic files."""
    sys.path.insert(0, "/root/reference/src")
    from pymgrit.induction_machine import helper as ref_helper

    msh, pre = _square_mesh(tmp_path, "m2", 4)
    r_nodes, r_nodes_r = ref_helper.get_nodes(msh)
    o_nodes, o_nodes_r = io_getdp.get_nodes(msh)
    assert set(r_nodes) == set(o_nodes)
    for k in r_nodes:
        np.testing.assert_array_equal(r_nodes[k], o_nodes[k])
    r_l, r_t, r_lr, r_tr = ref_helper.get_elements(msh)
    o_l, o_t, o_lr, o_tr = io_getdp.get_elements(msh)
    assert set(r_t) == set(o_t) and set(r_l) == set(o_l)
    r_c2u, r_u2c, r_b = ref_helper.pre_file(pre)
    o_c2u, o_u2c, o_b = io_getdp.pre_file(pre)
    assert r_c2u == o_c2u and r_u2c == o_u2c and r_b == o_b

    r_data = ref_helper.compute_data(pre, msh, 0)
    o_data = io_getdp.compute_data(pre, msh, 0)
    np.testing.assert_allclose(r_data['pointsCom'], o_data['pointsCom'])
    np.testing.assert_allclose(r_data['unknown'], o_data['unknown'])
    np.testing.assert_allclose(r_data['unknownCom'], o_data['unknownCom'])
    np.testing.assert_array_equal(r_data['elecom'], o_data['elecom'])
    np.testing.assert_array_equal(r_data['mappingInnerToUnknown'],
                                  o_data['mappingInnerToUnknown'])


def test_interp_weights_partition_of_unity():
    """Barycentric weights from a Delaunay triangulation reproduce linear
    functions exactly inside the hull."""
    rng = np.random.default_rng(0)
    coarse = rng.random((30, 2))
    # corners to guarantee hull coverage
    coarse = np.vstack([coarse, [[0, 0], [0, 1], [1, 0], [1, 1]]])
    fine = 0.1 + 0.8 * rng.random((50, 2))
    # tight simplex-location tolerance: the default 0.1 (matching the
    # reference) may assign near-edge points to a neighboring simplex and
    # clamp the small negative weight, which is only approximate.
    vtx, wts = io_getdp.interp_weights(coarse, fine, tol=1e-12)
    np.testing.assert_allclose(wts.sum(axis=1), 1.0, atol=1e-12)
    f = lambda p: 2.0 * p[:, 0] - 0.7 * p[:, 1] + 0.3
    interp = io_getdp.compute_mesh_transfer(f(coarse), vtx, wts, 0, 0)
    np.testing.assert_allclose(np.asarray(interp), f(fine), atol=1e-10)


def test_resolution_roundtrip(tmp_path):
    """set_resolution -> getdp_read_resolution roundtrip."""
    path = str(tmp_path / "sol.res")
    u = np.linspace(-1, 1, 17)
    io_getdp.set_resolution(path, 0.25, u, 17)
    t, x = io_getdp.getdp_read_resolution(path, 17)
    np.testing.assert_allclose(t, [0.25])
    np.testing.assert_allclose(x[0], u)


def test_get_values_from(tmp_path):
    path = str(tmp_path / "resJL.dat")
    with open(path, "w") as f:
        f.write("0 0.0 1.25\n0 0.1 2.5\n")
    np.testing.assert_allclose(io_getdp.get_values_from(path), [1.25, 2.5])


def test_machine_norm_excludes_scalars():
    u = MachineState(np.ones(3), np.ones(4), np.ones(5),
                     scalars=np.full(8, 100.0))
    assert abs(float(machine_norm(u)) - np.sqrt(12)) < 1e-12


# ---------------------------------------------------------------------------
# machine solvers on a synthetic "machine" application
# ---------------------------------------------------------------------------

class _SyntheticMachine(Application):
    """Decaying linear dynamics on machine states; joule losses converge to
    a periodic profile (stands in for the GetDP black box)."""

    def __init__(self, pwm=0, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.pwm = pwm
        self.fopt = ['Flag_PWM', pwm]
        self.vector_template = zero_state(2, 3, 2)
        start = zero_state(2, 3, 2)
        start["middle"] = np.array([1.0, 0.5, 0.25])
        self.vector_t_start = start
        from pymgrit_tpu.models.induction_machine.machine_state import machine_norm
        self.state_norm = machine_norm

    def step(self, u_start, t_start, t_stop):
        dt = t_stop - t_start
        decay = jnp.exp(-dt)
        middle = u_start["middle"] * decay + 0.1 * dt
        jl = jnp.sum(middle ** 2)
        scalars = jnp.zeros(8).at[0].set(jl)
        return MachineState(u_start["front"] * decay, middle,
                            u_start["back"] * decay, scalars)


def test_mgrit_machine_conv_jl():
    apps = [_SyntheticMachine(t_start=0, t_stop=4, nt=33),
            _SyntheticMachine(t_start=0, t_stop=4, nt=9)]
    solver = MgritMachineConvJl(problem=apps, tol=1.0, max_iter=8,
                                logging_lvl=30, nested_iteration=True)
    info = solver.solve()
    # joule-loss relative change drops below 1%
    assert info['conv'][-1] < 1.0
    # post-processing F-relax ran: F-points satisfy u_i = Phi(u_{i-1})
    u = solver.u[0]
    mid = np.asarray(u["middle"])
    t = solver.levels[0].t
    i = 1  # an F-point
    expected = mid[i - 1] * np.exp(-(t[i] - t[i - 1])) + 0.1 * (t[i] - t[i - 1])
    np.testing.assert_allclose(mid[i], expected, rtol=1e-10)


def test_mgrit_machine_pwm_switch():
    """Nested iteration must run with the sin source (fopt[-1]=0) and restore
    the PWM flag afterwards."""
    seen = []

    class Spy(_SyntheticMachine):
        def step(self, u_start, t_start, t_stop):
            seen.append(self.fopt[-1])
            return super().step(u_start, t_start, t_stop)

    apps = [Spy(pwm=1, t_start=0, t_stop=4, nt=17),
            Spy(pwm=1, t_start=0, t_stop=4, nt=5)]
    solver = MgritMachine(problem=apps, max_iter=1, logging_lvl=30,
                          nested_iteration=True)
    # flags seen while tracing the nested iteration were 0 (sin source)
    assert 0 in seen
    assert apps[0].fopt[-1] == 1  # restored


def test_res_parser_matches_reference():
    """The committed machine.res (incl. a re-stored step) parses identically
    through the reference helper — pins the overwrite-in-place semantics
    (reference helper.py:109-119) the round-5 fixture caught."""
    sys.path.insert(0, "/root/reference/src")
    from pymgrit.induction_machine import helper as ref_helper

    fix = os.path.join(REPO, "tests", "models", "fixtures", "im", "machine.res")
    rt, rx = ref_helper.getdp_read_resolution(fix, 32)
    ot, ox = io_getdp.getdp_read_resolution(fix, 32)
    np.testing.assert_allclose(ot, rt)
    np.testing.assert_allclose(ox, rx)
