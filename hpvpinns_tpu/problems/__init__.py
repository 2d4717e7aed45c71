from hpvpinns_tpu.problems import (
    advdiff,
    advdiff2d,
    burgers,
    helmholtz,
    kovasznay,
    taylorgreen,
    poisson1d,
    poisson2d,
    poisson3d,
)
from hpvpinns_tpu.problems.base import Problem

_BUILDERS = {
    "poisson1d": poisson1d.build,
    "poisson2d": poisson2d.build,
    "poisson3d": poisson3d.build,
    "advdiff": advdiff.build,
    "advdiff2d": advdiff2d.build,
    "burgers": burgers.build,
    "helmholtz2d": helmholtz.build,
    "kovasznay": kovasznay.build,
    "taylorgreen": taylorgreen.build,
}


def build(config) -> Problem:
    """Dispatch on config type (Poisson1DConfig / ... / BurgersConfig)."""
    from hpvpinns_tpu.config import (
        AdvDiff2DConfig,
        AdvDiffConfig,
        BurgersConfig,
        Helmholtz2DConfig,
        KovasznayConfig,
        TaylorGreenConfig,
        Poisson1DConfig,
        Poisson2DConfig,
        Poisson3DConfig,
    )

    if isinstance(config, Poisson1DConfig):
        return poisson1d.build(config)
    if isinstance(config, Poisson2DConfig):
        return poisson2d.build(config)
    if isinstance(config, Poisson3DConfig):
        return poisson3d.build(config)
    if isinstance(config, AdvDiffConfig):
        return advdiff.build(config)
    if isinstance(config, AdvDiff2DConfig):
        return advdiff2d.build(config)
    if isinstance(config, BurgersConfig):
        return burgers.build(config)
    if isinstance(config, Helmholtz2DConfig):
        return helmholtz.build(config)
    if isinstance(config, KovasznayConfig):
        return kovasznay.build(config)
    if isinstance(config, TaylorGreenConfig):
        return taylorgreen.build(config)
    raise TypeError(f"unknown problem config type: {type(config).__name__}")
