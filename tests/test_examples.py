"""The examples double as end-to-end smoke tests (each asserts a
correctness property; ref examples/*.py are sphinx-gallery doc pages)."""
import pytest


def test_example_pde():
    from examples.example_pde import main
    main()


def test_example_nonlocal():
    from examples.example_nonlocal import main
    main()


def test_example_inf_horizon_dirichlet():
    from examples.example_InfHorizonDirichlet import main
    main()


def test_example_neumann():
    from examples.example_Neumann import main
    main()


@pytest.mark.slow
def test_example_operator_interpolation():
    from examples.example_operator_interpolation import main
    main()
