from .classify import classify_state, classify_task_event  # noqa: F401
from .identifiers import task_identifier  # noqa: F401
