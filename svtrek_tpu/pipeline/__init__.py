"""Host→device pipelines for `audt` and `disc` modes."""
