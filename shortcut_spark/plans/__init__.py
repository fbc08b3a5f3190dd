from .access_path import AccessPath, choose_access_path

__all__ = ["AccessPath", "choose_access_path"]
