"""Dynamic (time-block) Schur-complement interface. Placeholder — implemented next."""


class DynamicModelSpec:  # pragma: no cover - placeholder
    def __init__(self, *a, **k):
        raise NotImplementedError("DynamicModelSpec lands in the next milestone")


class DynamicSchurComplementInteriorPointInterface:  # pragma: no cover
    def __init__(self, *a, **k):
        raise NotImplementedError(
            "DynamicSchurComplementInteriorPointInterface lands in the next milestone"
        )
