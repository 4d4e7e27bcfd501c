"""Funcotator: functional annotation against GENCODE datasources."""
