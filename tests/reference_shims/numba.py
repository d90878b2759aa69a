"""No-op numba shim: the reference's @numba.njit kernels are plain-python
compatible, so njit degrades to the undecorated function."""


def njit(*args, **kwargs):
    if args and callable(args[0]):
        return args[0]

    def wrap(fn):
        return fn

    return wrap
