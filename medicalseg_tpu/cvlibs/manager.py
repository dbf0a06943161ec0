# Copyright 2026. Apache License 2.0.
"""Component registries.

TPU-native re-implementation of the reference's ComponentManager
(reference: medicalseg/cvlibs/manager.py:23-149): a name -> component map
populated by the ``add_component`` decorator, with five global registries
(MODELS / BACKBONES / DATASETS / TRANSFORMS / LOSSES) used by the YAML
config layer to instantiate components reflectively from ``type:`` keys.
"""

import inspect
import warnings
from collections.abc import Sequence


class ComponentManager:
    """A name -> component registry.

    Components (classes or functions) register themselves via the
    :meth:`add_component` decorator and are retrieved by name with
    ``manager[name]``. Re-registering an existing name warns and
    overwrites (matching reference manager.py:104-111 semantics).
    """

    def __init__(self, name=None):
        self._components_dict = dict()
        self._name = name

    def __len__(self):
        return len(self._components_dict)

    def __repr__(self):
        name = self._name or self.__class__.__name__
        return "{}:{}".format(name, list(self._components_dict.keys()))

    def __getitem__(self, item):
        if item not in self._components_dict:
            raise KeyError("{} does not exist in registry {}".format(
                item, self))
        return self._components_dict[item]

    def __contains__(self, item):
        return item in self._components_dict

    @property
    def components_dict(self):
        return self._components_dict

    @property
    def name(self):
        return self._name

    def _add_single_component(self, component):
        if not (inspect.isclass(component) or inspect.isfunction(component)):
            raise TypeError("Expect class/function type, but received {}".
                            format(type(component)))
        component_name = component.__name__
        if component_name in self._components_dict:
            warnings.warn(
                "registry '{}' already has a component named '{}'; "
                "overwriting it with {}".format(self._name,
                                                component_name, component))
        self._components_dict[component_name] = component

    def add_component(self, components):
        """Decorator/registrar: add one component or a sequence of them."""
        if isinstance(components, Sequence):
            for component in components:
                self._add_single_component(component)
        else:
            self._add_single_component(components)
        return components


MODELS = ComponentManager(name="models")
BACKBONES = ComponentManager(name="backbones")
DATASETS = ComponentManager(name="datasets")
TRANSFORMS = ComponentManager(name="transforms")
LOSSES = ComponentManager(name="losses")
