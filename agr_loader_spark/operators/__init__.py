from .dedup import lww_reduce, lww_reduce_pandas, lww_reduce_window  # noqa: F401
from .fk_guard import fk_guard  # noqa: F401
from .closure import transitive_closure  # noqa: F401
