"""Plot helpers: matplotlib defaults and FE-solution plotting.

Counterpart of /root/reference/base/PyNucleus_base/plot_utils.py and the
plotManager of fem/PyNucleus_fem/mesh.py:3586.  Headless-safe (Agg).
"""
import numpy as np

__all__ = ['latexOptions', 'plotDefaults', 'plotManager']


def latexOptions(fig_width=6.0, fig_height=None, ratio=None):
    """Matplotlib rcParams for publication plots (ref plot_utils.py)."""
    if ratio is None:
        ratio = (np.sqrt(5.0) - 1.0) / 2.0
    if fig_height is None:
        fig_height = fig_width * ratio
    return {
        'figure.figsize': (fig_width, fig_height),
        'font.size': 10,
        'axes.labelsize': 10,
        'legend.fontsize': 8,
        'xtick.labelsize': 8,
        'ytick.labelsize': 8,
    }


def plotDefaults():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    plt.rcParams.update(latexOptions())


class plotManager:
    """Collect labelled FE solutions and plot them together
    (ref fem mesh.py:3586)."""

    def __init__(self, mesh, dm, defaults=None):
        self.mesh = mesh
        self.dm = dm
        self.defaults = defaults or {}
        self.plots = []

    def add(self, u, **kwargs):
        arr = np.asarray(u.data if hasattr(u, 'data') else u)
        self.plots.append((arr, kwargs))

    def plot(self, legendOutside=False, filename=None):
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        from .io import vertexValues
        fig, ax = plt.subplots()
        mesh, dm = self.mesh, self.dm
        if mesh.dim == 1:
            order = np.argsort(mesh.vertices[:, 0])
            for arr, kwargs in self.plots:
                vv = vertexValues(dm, arr)
                ax.plot(mesh.vertices[order, 0], vv[order], **kwargs)
            if any('label' in k for _, k in self.plots):
                ax.legend(loc='center left' if legendOutside else 'best',
                          bbox_to_anchor=(1, 0.5) if legendOutside else None)
        else:
            import matplotlib.tri as mtri
            tri = mtri.Triangulation(mesh.vertices[:, 0],
                                     mesh.vertices[:, 1], mesh.cells)
            arr, kwargs = self.plots[-1]
            vv = vertexValues(dm, arr)
            pc = ax.tripcolor(tri, vv,
                              shading=self.defaults.get('shading',
                                                        'gouraud'))
            fig.colorbar(pc, ax=ax)
            ax.set_aspect('equal')
        if filename:
            fig.savefig(filename, dpi=150, bbox_inches='tight')
        return ax
