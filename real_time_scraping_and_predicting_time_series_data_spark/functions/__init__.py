"""Reusable column-expression builders."""
