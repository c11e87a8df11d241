"""Local PDE driver problems (diffusion/Helmholtz).

Counterpart of /root/reference/fem/PyNucleus_fem/pdeProblems.py:15-331.
"""
from __future__ import annotations

import numpy as np

from ..base.utilsFem import problem, generates
from .meshes import meshFactory, simpleInterval, uniformSquare
from .functions import Lambda, constant

__all__ = ['diffusionProblem', 'helmholtzProblem']


class diffusionProblem(problem):
    """-div(diffusivity grad u) + reaction u = rhs with known solutions
    (ref pdeProblems.py:15)."""

    def setDriverArgs(self):
        p = self.driver.addGroup('problem')
        self.setDriverFlag('domain', 'square',
                           acceptedValues=['interval', 'square', 'cube'],
                           group=p)
        self.setDriverFlag('problem', 'sin',
                           acceptedValues=['reac-sin', 'poly', 'cos'], group=p)
        self.setDriverFlag('noRef', -1, argInterpreter=int, group=p)
        self.setDriverFlag('element', 'P1',
                           acceptedValues=['P1', 'P2', 'P3'], group=p)
        self.setDriverFlag('symmetric', False, group=p)

    def processCmdline(self, params):
        if params.get('noRef', -1) is None or params.get('noRef', -1) <= 0:
            domain, element = params['domain'], params['element']
            if domain in ('interval', 'unitInterval'):
                params['noRef'] = {'P1': 15, 'P2': 14, 'P3': 13}[element]
            elif domain in ('cube', 'unitCube', 'gradedCube'):
                params['noRef'] = {'P1': 6, 'P2': 5, 'P3': 4}[element]
            else:
                params['noRef'] = {'P1': 9, 'P2': 8, 'P3': 7}[element]
        super().processCmdline(params)

    @generates(['dim', 'mesh0', 'diffusivity', 'reaction', 'rhsFun',
                'exactSolution', 'L2ex', 'H10ex', 'boundaryCond'])
    def processProblem(self, domain, problem):
        self.diffusivity = None
        self.reaction = None
        self.boundaryCond = None
        if domain in ('interval', 'unitInterval'):
            self.dim = 1
            self.mesh0 = simpleInterval(0.0, 1.0)
            if problem == 'sin':
                self.rhsFun = Lambda(lambda x: np.pi ** 2 * np.sin(np.pi * x[0]))
                self.exactSolution = Lambda(lambda x: np.sin(np.pi * x[0]))
                self.L2ex = 0.5
                self.H10ex = np.pi ** 2 / 2
            else:
                raise NotImplementedError(problem)
        elif domain in ('square', 'unitSquare'):
            self.dim = 2
            self.mesh0 = uniformSquare(N=2, ax=0., ay=0., bx=1., by=1.)
            if problem == 'sin':
                self.rhsFun = Lambda(
                    lambda x: 2 * np.pi ** 2 * np.sin(np.pi * x[0]) * np.sin(np.pi * x[1]))
                self.exactSolution = Lambda(
                    lambda x: np.sin(np.pi * x[0]) * np.sin(np.pi * x[1]))
                self.L2ex = 0.25
                self.H10ex = 2 * np.pi ** 2 / 4
            elif problem == 'poly':
                self.rhsFun = Lambda(
                    lambda x: 32 * x[0] * (1 - x[0]) + 32 * x[1] * (1 - x[1]))
                self.exactSolution = Lambda(
                    lambda x: 16 * x[0] * x[1] * (1 - x[0]) * (1 - x[1]))
                self.L2ex = 256 / 900
                self.H10ex = 256 / 45
            else:
                raise NotImplementedError(problem)
        elif domain in ('cube', 'unitCube'):
            self.dim = 3
            from .meshes import simpleBox
            self.mesh0 = simpleBox()
            if problem == 'sin':
                self.rhsFun = Lambda(
                    lambda x: 3 * np.pi ** 2 * np.sin(np.pi * x[0])
                    * np.sin(np.pi * x[1]) * np.sin(np.pi * x[2]))
                self.exactSolution = Lambda(
                    lambda x: np.sin(np.pi * x[0]) * np.sin(np.pi * x[1])
                    * np.sin(np.pi * x[2]))
                self.L2ex = 0.125
                self.H10ex = 3 * np.pi ** 2 / 8
            else:
                raise NotImplementedError(problem)
        else:
            raise NotImplementedError(domain)


class helmholtzProblem(problem):
    """-Delta u - omega^2 u = f with impedance boundary condition
    du/dn + i omega u = g (ref pdeProblems.py:238-331).  The 'wave' problem
    manufactures u = exp(i xi.x)."""

    def setDriverArgs(self):
        p = self.driver.addGroup('problem')
        self.setDriverFlag('domain', 'square',
                           acceptedValues=['square', 'interval', 'cube'],
                           group=p)
        self.setDriverFlag('problem', 'wave',
                           acceptedValues=['wave', 'greens'], group=p)
        self.setDriverFlag('element', 'P1', acceptedValues=['P1'], group=p)
        self.setDriverFlag('frequency', 40., group=p)
        self.setDriverFlag('symmetric', False, group=p)

    @generates(['dim', 'noRef', 'mesh0', 'solEx', 'rhs', 'boundaryCond'])
    def processProblem(self, domain, problem, element, frequency, symmetric):
        from .meshes import simpleBox

        def outerNormal(x):
            # unit outer normal of the unit box at a boundary point
            n = np.zeros(len(x))
            for k in range(len(x)):
                if abs(x[k]) < 1e-12:
                    n[k] = -1.0
                    return n
                if abs(x[k] - 1.0) < 1e-12:
                    n[k] = 1.0
                    return n
            raise NotImplementedError(x)

        if domain == 'interval':
            self.dim = 1
            self.noRef = 7
            self.mesh0 = simpleInterval(0.0, 1.0)
            xi = np.array([0.5])
        elif domain == 'square':
            self.dim = 2
            self.noRef = 8
            self.mesh0 = uniformSquare(N=2, ax=0., ay=0., bx=1., by=1.)
            xi = np.array([0.5, 0.25])
        elif domain == 'cube':
            self.dim = 3
            self.noRef = 6
            self.mesh0 = simpleBox()
            xi = np.array([0.75, 0.5, 0.25])
        else:
            raise NotImplementedError(domain)

        freq = frequency
        if problem == 'wave':
            solEx = lambda x: np.exp(1j * np.dot(np.asarray(x), xi))
            self.solEx = Lambda(solEx)
            xisq = float(np.dot(xi, xi))
            self.rhs = Lambda(lambda x: (xisq - freq ** 2) * solEx(x))
            self.boundaryCond = Lambda(
                lambda x: 1j * (np.dot(xi, outerNormal(x)) + freq) * solEx(x))
        elif problem == 'greens':
            center = np.full(self.dim, 0.5)
            radius = 1e-2 if self.dim < 3 else 1e-1
            self.rhs = Lambda(
                lambda x: 1.0 + 0j
                if np.linalg.norm(np.asarray(x) - center) < radius else 0j)
            self.solEx = None
            self.boundaryCond = None
        else:
            raise NotImplementedError(problem)
