"""Structured Streaming: the idiomatic upgrade of the reference's
human-in-the-loop monthly CSV upload (app/app.py:15-22).

ingest   - file-source stream of lançamentos CSVs → validated bronze
windows  - watermarked tumbling/sliding aggregations over event streams
"""

from .ingest import stream_lancamentos
from .windows import windowed_event_counts

__all__ = ["stream_lancamentos", "windowed_event_counts"]
