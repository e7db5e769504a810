def lstsq(*args, **kwargs):
    raise NotImplementedError("scipy shim: linalg.lstsq not needed for detect()")
