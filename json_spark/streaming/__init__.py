from .validate import (streaming_content_verdicts, streaming_row_verdicts,
                       streaming_windowed_verdicts)
from .referential import streaming_referential_orphans

__all__ = ["streaming_row_verdicts", "streaming_windowed_verdicts",
           "streaming_content_verdicts", "streaming_referential_orphans"]
