from .validate import streaming_row_verdicts, streaming_windowed_verdicts

__all__ = ["streaming_row_verdicts", "streaming_windowed_verdicts"]
