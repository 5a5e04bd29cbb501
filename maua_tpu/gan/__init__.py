# stylegan2 imports deferred until the model module lands
