"""Stepper construction: dispatch a Method handle to its implementation."""


def build_stepper(method, fun, n, dtype, **options):
    family = method.family
    merged = dict(method.options or {})
    merged.update(options)
    sc_params = merged.pop("sc_params", None)
    if family == "erk":
        from .erk import ERKStepper
        return ERKStepper(fun, method.tableau, n, dtype,
                          sc_params=sc_params, options=merged)
    if family == "ckdisc":
        from .ckdisc import CKdiscStepper
        return CKdiscStepper(fun, method.tableau, n, dtype, options=merged)
    if family == "rkn":
        from .rkn import RKNStepper
        return RKNStepper(fun, method.tableau, n, dtype,
                          sc_params=sc_params, options=merged)
    if family == "esdirk":
        from .esdirk import ESDIRKStepper
        return ESDIRKStepper(fun, method.tableau, n, dtype,
                             sc_params=sc_params, options=merged)
    if family == "adams":
        from .adams import AdamsStepper
        return AdamsStepper(fun, n, dtype, options=merged)
    if family == "rkc":
        from .rkc import RKCStepper
        return RKCStepper(fun, n, dtype, options=merged)
    raise ValueError(f"unknown method family {family!r}")
