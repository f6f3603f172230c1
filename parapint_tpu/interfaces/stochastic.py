"""Two-stage stochastic Schur-complement interface. Placeholder — implemented next."""


class StochasticModelSpec:  # pragma: no cover - placeholder
    def __init__(self, *a, **k):
        raise NotImplementedError("StochasticModelSpec lands in the next milestone")


class StochasticSchurComplementInteriorPointInterface:  # pragma: no cover
    def __init__(self, *a, **k):
        raise NotImplementedError(
            "StochasticSchurComplementInteriorPointInterface lands in the next milestone"
        )
