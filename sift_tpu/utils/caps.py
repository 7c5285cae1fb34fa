"""Static-capacity helpers.

XLA wants static shapes; dynamic counts get padded to a power-of-two
capacity LADDER so each jitted program compiles once per ladder step
(logarithmic in problem size), not once per distinct count. This is
the one shared definition — capacity floors differ per call site, but
the ladder rule must not.
"""

from __future__ import annotations

import numpy as np


def pow2_cap(n: int, lo: int = 16) -> int:
    """Smallest power of two >= max(n, 2), floored at `lo`."""
    return max(1 << int(np.ceil(np.log2(max(n, 2)))), lo)
