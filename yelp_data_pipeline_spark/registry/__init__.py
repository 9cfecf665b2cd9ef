"""Query-registry package: one module per operator family.

Import order below IS the registration order (every module's
@_q calls append to core._REGISTRY as it is imported) and
must stay byte-identical to the pre-split single-file order
— the driver's export contract depends on it.
"""

from . import core  # noqa: F401
from . import dashboard  # noqa: F401,E402
from . import dims  # noqa: F401,E402
from . import facts  # noqa: F401,E402
from . import setops  # noqa: F401,E402
from . import semijoins  # noqa: F401,E402
from . import filters  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import aggregates  # noqa: F401,E402
from . import merge  # noqa: F401,E402
from . import dedup  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import textops  # noqa: F401,E402
from . import curation  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import streaming  # noqa: F401,E402
from . import behavior  # noqa: F401,E402
from . import quality  # noqa: F401,E402
from . import warehouse_a  # noqa: F401,E402
from . import warehouse_b  # noqa: F401,E402
from . import stats_evals  # noqa: F401,E402
from . import graph_ml  # noqa: F401,E402

ALL_MODULES = [core, dashboard, dims, facts, setops, semijoins, filters, windows, aggregates, merge, dedup, similarity, textops, curation, multimodal, streaming, behavior, quality, warehouse_a, warehouse_b, stats_evals, graph_ml]
