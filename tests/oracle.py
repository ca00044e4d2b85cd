"""Serial numpy oracle of the MGRIT FAS algorithm.

An independent, loop-based implementation of the algorithm in reference
src/pymgrit/core/mgrit.py (serial semantics), used to cross-check the
batched JAX solver on configurations with no published golden history.
States are numpy arrays; step is a python callable."""

import numpy as np


class Oracle:
    def __init__(self, t_grids, steps, tol=1e-7, max_iter=100, cf_iter=1,
                 cycle_type='V', weight_c=1.0, nested_iteration=True,
                 u0=None, restrict=None, interp=None):
        self.L = len(t_grids)
        self.t = [np.asarray(g, dtype=np.float64) for g in t_grids]
        self.steps = steps
        self.tol = tol
        self.max_iter = max_iter
        self.cf_iter = cf_iter if isinstance(cf_iter, list) else [cf_iter] * self.L
        self.cycle_type = cycle_type
        self.w = weight_c
        self.restrict = restrict or [lambda u: u] * (self.L - 1)
        self.interp = interp or [lambda u: u] * (self.L - 1)

        self.cpts = []
        self.fpts = []
        for l in range(self.L - 1):
            c = np.where(np.isin(self.t[l], self.t[l + 1]))[0]
            self.cpts.append(c)
            self.fpts.append(np.setdiff1d(np.arange(len(self.t[l])), c))
        self.cpts.append(np.arange(len(self.t[-1])))
        self.fpts.append(np.array([], dtype=int))

        self.u = [[np.zeros_like(np.asarray(u0[l], dtype=np.float64)) for _ in self.t[l]]
                  for l in range(self.L)]
        for l in range(self.L):
            self.u[l][0] = np.asarray(u0[l], dtype=np.float64).copy()
        self.v = [None] + [[np.zeros_like(self.u[l][0]) for _ in self.t[l]]
                           for l in range(1, self.L)]
        self.g = [None] + [[np.zeros_like(self.u[l][0]) for _ in self.t[l]]
                           for l in range(1, self.L)]
        if nested_iteration:
            self.nested_iteration()

    def f_relax(self, l):
        for i in self.fpts[l]:
            s = self.steps[l](self.u[l][i - 1], self.t[l][i - 1], self.t[l][i])
            self.u[l][i] = (self.g[l][i] + s) if l > 0 else s

    def c_relax(self, l):
        for i in self.cpts[l]:
            if i != 0:
                s = self.steps[l](self.u[l][i - 1], self.t[l][i - 1], self.t[l][i])
                if l > 0:
                    s = self.g[l][i] + s
                self.u[l][i] = s * self.w + self.u[l][i] * (1.0 - self.w)

    def forward_solve(self, l):
        for i in range(1, len(self.t[l])):
            s = self.steps[l](self.u[l][i - 1], self.t[l][i - 1], self.t[l][i])
            self.u[l][i] = (self.g[l][i] + s) if l > 0 else s

    def fas_residual(self, l):
        c = self.cpts[l]
        for i in range(len(c)):
            self.u[l + 1][i] = self.restrict[l](self.u[l][c[i]])
        self.v[l + 1] = [x.copy() for x in self.u[l + 1]]
        for i in range(1, len(c)):
            s_f = self.steps[l](self.u[l][c[i] - 1], self.t[l][c[i] - 1], self.t[l][c[i]])
            if l == 0:
                inner = s_f - self.u[l][c[i]]
            else:
                inner = self.g[l][c[i]] - self.u[l][c[i]] + s_f
            s_c = self.steps[l + 1](self.v[l + 1][i - 1], self.t[l + 1][i - 1], self.t[l + 1][i])
            self.g[l + 1][i] = self.restrict[l](inner) + self.v[l + 1][i] - s_c

    def error_correction(self, l):
        c = self.cpts[l]
        for i in range(1, len(c)):
            self.u[l][c[i]] = self.u[l][c[i]] + self.interp[l](
                self.u[l + 1][i] - self.v[l + 1][i])

    def cycle(self, l, cycle_type, first_f, lvl0_first):
        if l == self.L - 1:
            self.forward_solve(l)
            return
        if (l > 0 or lvl0_first) and first_f:
            self.f_relax(l)
        for _ in range(self.cf_iter[l]):
            self.c_relax(l)
            self.f_relax(l)
        self.fas_residual(l)
        self.cycle(l + 1, cycle_type, True, lvl0_first)
        self.error_correction(l)
        self.f_relax(l)
        if l != 0 and cycle_type == 'F':
            self.cycle(l, 'V', False, lvl0_first)

    def nested_iteration(self):
        self.forward_solve(self.L - 1)
        for l in range(self.L - 2, -1, -1):
            for i in range(1, len(self.cpts[l])):
                self.u[l][self.cpts[l][i]] = self.interp[l](self.u[l + 1][i])
            if l > 0:
                self.cycle(l, 'V', True, True)

    def residual(self):
        r = []
        for i in self.cpts[0] if self.L > 1 else np.arange(len(self.t[0])):
            if i != 0:
                s = self.steps[0](self.u[0][i - 1], self.t[0][i - 1], self.t[0][i])
                r.append(np.linalg.norm(s - self.u[0][i]))
        return np.linalg.norm(np.array(r))

    def solve(self):
        history = []
        for it in range(self.max_iter):
            self.cycle(0, self.cycle_type, True, it == 0)
            history.append(self.residual())
            if history[-1] < self.tol:
                break
        return np.array(history)
