"""Structured Streaming jobs: reference report parity (complete-mode
histogram, 60 s trigger analog) plus the windowing/watermark/dedup
surface the reference's full-recompute design never needed."""
