"""The engine's operator library — Spark-first re-expressions of the
reference pipelines (marEx detect.py / track.py; see SURVEY.md §2).

- climatology: anomaly methods (fixed/shifting baseline, harmonic detrend)
- threshold:   global & hobday percentile thresholds (exact + histogram)
- detect:      preprocess orchestrator (raw series → boolean extremes)
- label:       per-timestep connected-component labelling (grouped UDF)
- morphology:  fill_holes / fill_time_gaps / small-object filtering
- overlap:     temporal overlap self-join + threshold filter
- components:  event-graph connected components + ID remap
- stats:       per-event area / centroid / lifetime statistics
- track:       tracker orchestrator (boolean extremes → labelled events)
"""
