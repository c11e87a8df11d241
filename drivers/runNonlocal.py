#!/usr/bin/env python3
"""Finite-horizon nonlocal Poisson problems.

TPU-native counterpart of /root/reference/drivers/runNonlocal.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('PYNUCLEUS_PLATFORM', 'cpu') == 'cpu':
    import jax
    jax.config.update('jax_platforms', 'cpu')

from pynucleus_tpu.base import driver
from pynucleus_tpu.nl.problems import nonlocalPoissonProblem
from pynucleus_tpu.nl.discretized import discretizedNonlocalProblem


def main(argv=None):
    d = driver()
    p = nonlocalPoissonProblem(d)
    discrProblem = discretizedNonlocalProblem(d, p)
    d.process(argv=argv)

    mS = discrProblem.modelSolution

    results = d.addOutputGroup('results')
    discrProblem.report(results)
    mS.reportSolve(results)
    results.log()

    errors = d.addOutputGroup('errors', tested=True)
    mS.reportErrors(errors)
    errors.log()

    d.finish()
    return d, mS


if __name__ == '__main__':
    main()
