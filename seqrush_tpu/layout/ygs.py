"""The Ygs sort pipeline: Y = path-guided SGD, g = groom, s = toposort.

Exact phase sequence and parameter derivation of the reference
(/root/reference/src/ygs_sort.rs): min_term_updates = sum of path step
counts, eta_max = (max path step count)^2, space = max path length in bp
(ygs_sort.rs:49-91); each phase applies its ordering/flips before the next
runs (ygs_sort.rs:96-162).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..graph.bigraph import BidirectedGraph
from ..graph.groom import apply_grooming, groom_order
from ..graph.toposort import exact_odgi_topological_order
from .sgd import PathIndex, PathSGDParams, path_sgd_sort


@dataclass
class YgsParams:
    iter_max: int = 100
    iter_with_max_learning_rate: int = 0
    min_term_updates: int = 0
    delta: float = 0.0
    eps: float = 0.01
    eta_max: float = 0.0
    theta: float = 0.99
    space: int = 0
    space_max: int = 100
    space_quantization_step: int = 100
    cooling_start: float = 0.5
    nthreads: int = 1
    verbose: bool = False
    seed: int = 9399220

    @staticmethod
    def from_graph(graph: BidirectedGraph, verbose: bool = False, nthreads: int = 1) -> "YgsParams":
        params = YgsParams(verbose=verbose, nthreads=nthreads)
        index = PathIndex.from_graph(graph)
        if index.path_count.size:
            params.min_term_updates = int(index.path_count.sum())
            params.eta_max = float(int(index.path_count.max()) ** 2)
            params.space = int(index.path_len.max())
        if verbose:
            print(
                f"[ygs_sort] min_term_updates={params.min_term_updates} "
                f"eta_max={params.eta_max} space={params.space}"
            )
        return params

    def to_sgd(self) -> PathSGDParams:
        return PathSGDParams(
            iter_max=self.iter_max,
            iter_with_max_learning_rate=self.iter_with_max_learning_rate,
            min_term_updates=self.min_term_updates,
            delta=self.delta,
            eps=self.eps,
            eta_max=self.eta_max,
            theta=self.theta,
            space=self.space,
            space_max=self.space_max,
            space_quantization_step=self.space_quantization_step,
            cooling_start=self.cooling_start,
            nthreads=self.nthreads,
            progress=self.verbose,
            seed=self.seed,
        )


def ygs_sort(
    graph: BidirectedGraph,
    params: YgsParams | None = None,
    use_sgd: bool = True,
    use_groom: bool = True,
    use_topo: bool = True,
) -> None:
    if params is None:
        params = YgsParams.from_graph(graph)
    if use_sgd:
        ordering = path_sgd_sort(graph, params.to_sgd())
        graph.apply_ordering(ordering)
    if use_groom:
        apply_grooming(graph, groom_order(graph))
    if use_topo:
        graph.apply_ordering(exact_odgi_topological_order(graph, True, False))


def sgd_sort_only(graph: BidirectedGraph, params: YgsParams) -> None:
    ygs_sort(graph, params, use_sgd=True, use_groom=False, use_topo=False)


def groom_only(graph: BidirectedGraph) -> None:
    ygs_sort(graph, None, use_sgd=False, use_groom=True, use_topo=False)


def topological_sort_only(graph: BidirectedGraph) -> None:
    ygs_sort(graph, None, use_sgd=False, use_groom=False, use_topo=True)
