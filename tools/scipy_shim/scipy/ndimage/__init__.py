import numpy as np


def label(arr):
    """1-D connected-component labeling, matching scipy.ndimage.label semantics
    for a 1-D boolean input: consecutive runs of True get labels 1..n."""
    a = np.asarray(arr).astype(bool).ravel()
    labels = np.zeros(a.shape, dtype=np.int32)
    n = 0
    prev = False
    for i, v in enumerate(a):
        if v:
            if not prev:
                n += 1
            labels[i] = n
        prev = v
    return labels, n
