"""Signal models: redshift-space correlations, 21cm, LSS pipeline."""
